"""Baseline JPEG codec — pure numpy + stdlib, no external codec libraries.

Implements the baseline sequential DCT process of ITU-T T.81 (ISO/IEC
10918-1): 8-bit samples, Huffman entropy coding, SOF0 frames. The encoder
emits standards-compliant JFIF files (Annex K quantization + Huffman
tables, IJG-style quality scaling, optional 4:2:0 chroma subsampling and
restart intervals); the decoder handles any baseline stream — grayscale or
YCbCr, arbitrary 1/2 sampling factors, multiple DQT/DHT segments, restart
markers — not just this encoder's output.

Design notes (the reference engine has no binary/media type at all — see
SURVEY.md §2.6 — so this is a north-rule training-pipeline capability, not
a parity item):

- All per-block math is vectorized: the 2-D DCT/IDCT run as one einsum
  over every 8×8 block of a plane at once; quantization, zigzag and
  dequantization are single fancy-index operations over the (nblocks, 64)
  coefficient matrix.
- Only the entropy coding loop is per-symbol Python — inherent to Huffman
  bitstreams. The decoder amortizes it with a 16-bit peek LUT per Huffman
  table (canonical-code prefix fill), making each symbol O(1); the bit
  cursor reads from a precomputed uint32 sliding-window array, so there is
  no per-bit work anywhere.
- Progressive (SOF2), arithmetic coding, 12-bit precision, and lossless
  modes are out of scope and raise loudly.

Used by ``stages/multimodal.py`` (``image/jpeg`` in MediaDecoder /
ImageResizer) behind the same actor-pool map_batches shape as the other
codecs: decode state built once per actor, small payload-sized batches,
features — never pixels — entering any shuffle.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# zigzag position -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)          # natural index -> zigzag position

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Huffman table spec: (BITS[1..16] code-length counts, HUFFVAL symbol list)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix D: forward = D @ X @ D.T."""
    k = np.arange(8, dtype=np.float64)
    d = np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 16.0) * 0.5
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (natural order)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


@lru_cache(maxsize=16)
def _canonical_codes(bits: tuple, vals: tuple) -> dict:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C.

    Memoized: the encoder only ever uses the four Annex K tables, so the
    code dicts are built once per process instead of once per payload."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        """Pad with 1-bits to a byte boundary (T.81 F.1.2.3)."""
        r = (-self.n) % 8
        if r:
            self.write((1 << r) - 1, r)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (H/8 * W/8, 8, 8), raster order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _unblockify(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * 8, bw * 8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — replication keeps block
    boundaries smooth so padding costs no extra AC energy."""
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge")


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Plane (padded to 8s) → (nblocks, 64) quantized zigzag-order int32."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT, optimize=True)
    q = np.round(coef.reshape(-1, 64) / qt[None, :].astype(np.float64))
    # natural → zigzag order: zz[p] = natural[ZIGZAG[p]]
    return q.astype(np.int32)[:, ZIGZAG]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    ssss = mag.bit_length()
    code, length = dc_codes[ssss]
    bw.write(code, length)
    if ssss:
        v = diff if diff >= 0 else diff + (1 << ssss) - 1
        bw.write(v, ssss)
    # AC: run-length coded (RRRRSSSS)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        prev = int(idx) + 1
        while run >= 16:
            zrl, zl = ac_codes[0xF0]
            bw.write(zrl, zl)
            run -= 16
        v = int(zz[1 + idx])
        mag = abs(v)
        ssss = mag.bit_length()
        code, length = ac_codes[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << ssss) - 1, ssss)
    if prev != 63:
        eob, el = ac_codes[0x00]
        bw.write(eob, el)
    return dc


def jpeg_encode(img: np.ndarray, quality: int = 85, *,
                subsample: bool = True, restart_interval: int = 0,
                interleave: bool = True) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JFIF JPEG bytes.

    ``subsample=True`` uses 4:2:0 chroma (2×2 mean), else 4:4:4.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (and exists mainly so the decoder's restart path has a
    self-contained test fixture). ``interleave=False`` writes one
    non-interleaved scan per component (legal baseline, produced e.g. by
    libjpeg scan scripts) — the decoder must reproduce the interleaved
    pixels exactly, since both orders carry the same coefficients."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and img.shape[2] == 1:
        img, gray = img[:, :, 0], True
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode: empty image")
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        planes = [_pad_edge(img.astype(np.float64), 8, 8)]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample:
            y = _pad_edge(y, 16, 16)
            cb = _pad_edge(cb, 2, 2)
            cr = _pad_edge(cr, 2, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            y = _pad_edge(y, 8, 8)
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per component: quantized zigzag blocks + the block-grid width, padded
    # out to the MCU grid so every MCU indexes valid blocks
    comp_zz, comp_bw = [], []
    for plane, (sh, sv), qt in zip(planes, samp, qts):
        need_h, need_w = mcus_y * sv * 8, mcus_x * sh * 8
        if plane.shape[0] < need_h or plane.shape[1] < need_w:
            plane = np.pad(plane, ((0, need_h - plane.shape[0]),
                                   (0, need_w - plane.shape[1])), mode="edge")
        comp_zz.append(_fdct_quant(plane, qt))
        comp_bw.append(need_w // 8)

    dc_l = _canonical_codes(tuple(_DC_LUMA_BITS), tuple(_DC_LUMA_VALS))
    ac_l = _canonical_codes(tuple(_AC_LUMA_BITS), tuple(_AC_LUMA_VALS))
    dc_c = _canonical_codes(tuple(_DC_CHROMA_BITS), tuple(_DC_CHROMA_VALS))
    ac_c = _canonical_codes(tuple(_AC_CHROMA_BITS), tuple(_AC_CHROMA_VALS))
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    if interleave:
        bw_ = _BitWriter()
        preds = [0] * len(planes)
        rst = 0
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_i and \
                        mcu_i % restart_interval == 0:
                    bw_.pad_to_byte()
                    bw_.buf += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0] * len(planes)
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            bi = (my * sv + by) * comp_bw[ci] \
                                + (mx * sh + bx)
                            preds[ci] = _encode_block(
                                bw_, comp_zz[ci][bi], preds[ci], *huff[ci])
                mcu_i += 1
        bw_.pad_to_byte()
        scan_payloads = [bytes(bw_.buf)]
    else:
        # non-interleaved: one scan per component; the data unit is ONE
        # block and the scan covers only the component's own block grid
        # (T.81 A.2.2) — restart_interval counts blocks here
        scan_payloads = []
        for ci, (sh, sv) in enumerate(samp):
            cw = -(-w * sh // hmax)
            chh = -(-h * sv // vmax)
            cbw, cbh = -(-cw // 8), -(-chh // 8)
            bw_ = _BitWriter()
            pred, rst, u = 0, 0, 0
            for by in range(cbh):
                for bx in range(cbw):
                    if restart_interval and u and \
                            u % restart_interval == 0:
                        bw_.pad_to_byte()
                        bw_.buf += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        pred = 0
                    bi = by * comp_bw[ci] + bx
                    pred = _encode_block(bw_, comp_zz[ci][bi], pred,
                                         *huff[ci])
                    u += 1
            bw_.pad_to_byte()
            scan_payloads.append(bytes(bw_.buf))

    # --- assemble the file ---
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")                     # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].astype(np.uint8)))
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    # DHT (class<<4 | id)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS)
               + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS)
               + bytes(_AC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA_BITS)
                   + bytes(_DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_AC_CHROMA_BITS)
                   + bytes(_AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if interleave:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += scan_payloads[0]
    else:
        for ci in range(ncomp):
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0])
            out += seg(0xDA, sos)
            out += scan_payloads[ci]
    out += b"\xFF\xD9"                               # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _decode_lut(bits: bytes, vals: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Canonical Huffman table → 16-bit-peek LUT: (symbol, code length).

    Memoized on the raw (BITS, HUFFVAL) bytes: the LUT is a 65536-entry
    prefix fill (~1.5 MB of allocation) that would otherwise be rebuilt
    for every payload a decode actor sees, while in practice a corpus
    reuses a handful of tables (the encoder only ever emits Annex K)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            sym[lo:lo + (1 << (16 - length))] = vals[k]
            ln[lo:lo + (1 << (16 - length))] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitReader:
    """O(1) 16-bit peeks via a precomputed uint32 sliding-window array."""

    def __init__(self, data: bytes):
        b = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
        # generous zero tail: a single block consumes < 4096 bits before
        # the next block-start truncation check, so a mid-block overrun on
        # a truncated stream stays in-bounds (reading zeros) instead of
        # escaping as a raw numpy IndexError; the check then raises
        # JpegFormatError at the next block boundary
        b = np.concatenate([b, np.zeros(4 + 520, dtype=np.uint32)])
        self.words = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
        self.pos = 0
        self.limit = len(data) * 8

    def peek16(self) -> int:
        p = self.pos
        return int((self.words[p >> 3] >> (16 - (p & 7))) & 0xFFFF)

    def read(self, n: int) -> int:
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, ssss: int) -> int:
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


class JpegFormatError(ValueError):
    pass


def _entropy_segments(entropy: bytes) -> list[bytes]:
    """Unstuff 0xFF00 and split the scan's entropy data at RSTn markers."""
    raw = np.frombuffer(entropy, dtype=np.uint8)
    ff = np.nonzero(raw == 0xFF)[0]
    segments: list[bytes] = []
    cur = bytearray()
    last = 0
    for i in ff:
        if i + 1 >= len(raw):
            break
        nxt = raw[i + 1]
        if nxt == 0x00:                              # stuffed FF
            cur += raw[last:i + 1].tobytes()
            last = i + 2
        elif 0xD0 <= nxt <= 0xD7:                    # restart marker
            cur += raw[last:i].tobytes()
            segments.append(bytes(cur))
            cur = bytearray()
            last = i + 2
    cur += raw[last:].tobytes()
    segments.append(bytes(cur))
    return segments


def _decode_block(rd: "_BitReader", blk: np.ndarray, dlut: tuple,
                  alut: tuple, pred: int) -> int:
    """Huffman-decode one 8×8 data unit into ``blk`` (zigzag order);
    returns the updated DC predictor."""
    if rd.pos >= rd.limit:
        raise JpegFormatError("entropy data truncated")
    dsym, dlen = dlut
    asym, alen = alut
    pk = rd.peek16()
    ssss = int(dsym[pk])
    ll = int(dlen[pk])
    if ll == 0:
        raise JpegFormatError("bad DC Huffman code")
    rd.pos += ll
    if ssss > 11:                    # baseline DC categories are 0..11
        raise JpegFormatError("bad DC magnitude category")
    diff = _extend(rd.read(ssss), ssss) if ssss else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        pk = rd.peek16()
        rs = int(asym[pk])
        ll = int(alen[pk])
        if ll == 0:
            raise JpegFormatError("bad AC Huffman code")
        rd.pos += ll
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:              # ZRL
                k += 16
                continue
            break                    # EOB
        k += r
        if k > 63:
            raise JpegFormatError("AC run past block end")
        blk[k] = _extend(rd.read(s), s)
        k += 1
    return pred


def _decode_scan(by_id: dict, luts: dict, smap: list, entropy: bytes,
                 dri: int, mcus_x: int, mcus_y: int, fh: int, fw: int,
                 hmax: int, vmax: int) -> None:
    """Decode one SOS's entropy data into the component coefficient
    stores. Multi-component scans are MCU-interleaved; a single-component
    scan is non-interleaved per T.81 A.2.2 — its data unit is ONE block
    and it covers only the component's own block grid (no padding to the
    MCU boundary), so restart intervals count blocks there."""
    order = []
    for cs, td, ta in smap:
        c = by_id.get(cs)
        if c is None:
            raise JpegFormatError(f"SOS references unknown component {cs}")
        order.append((c, luts.get((0, td)), luts.get((1, ta))))
        if order[-1][1] is None or order[-1][2] is None:
            raise JpegFormatError("SOS references missing Huffman table")
    segments = _entropy_segments(entropy)

    interleaved = len(order) > 1
    if interleaved:
        units = mcus_x * mcus_y
    else:
        c0 = order[0][0]
        cw = -(-fw * c0["h"] // hmax)                # component samples
        ch = -(-fh * c0["v"] // vmax)
        cbw, cbh = -(-cw // 8), -(-ch // 8)          # component blocks
        units = cbw * cbh

    seg_i = 0
    rd = _BitReader(segments[0])
    preds = {cid: 0 for cid in by_id}
    for u in range(units):
        if dri and u and u % dri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise JpegFormatError("missing restart segment")
            rd = _BitReader(segments[seg_i])
            preds = {cid: 0 for cid in by_id}
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for c, dlut, alut in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][(my * c["v"] + by) * c["bw"]
                                        + (mx * c["h"] + bx)]
                        preds[c["id"]] = _decode_block(
                            rd, blk, dlut, alut, preds[c["id"]])
        else:
            c, dlut, alut = order[0]
            by, bx = divmod(u, cbw)
            blk = c["coef"][by * c["bw"] + bx]
            preds[c["id"]] = _decode_block(rd, blk, dlut, alut,
                                           preds[c["id"]])


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w) or (h, w, 3) uint8.

    Baseline sequential DCT only (SOF0); progressive / arithmetic /
    12-bit / lossless raise ``JpegFormatError``. Handles grayscale and
    YCbCr with any 1/2 sampling factors, restart markers, multi-table
    DQT/DHT segments, and both interleaved and non-interleaved
    (one-component-per-scan) baseline scans. Truncated or corrupt
    entropy data raises ``JpegFormatError`` (never a raw numpy error)."""
    data = payload
    if data[:2] != b"\xFF\xD8":
        raise JpegFormatError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    luts: dict[tuple, tuple] = {}
    frame = None
    dri = 0
    scans: list[tuple[list, bytes, int]] = []
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise JpegFormatError(f"marker expected at {pos}")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:                                # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        if pos + 2 > n:
            raise JpegFormatError("truncated segment header")
        (L,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + L]
        if len(body) != L - 2:
            raise JpegFormatError("truncated segment body")
        pos += L
        if m == 0xDB:                                # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8).astype(np.int64)
                i += 65
        elif m == 0xC4:                              # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = bytes(body[i + 1:i + 17])
                nv = sum(bits)
                vals = bytes(body[i + 17:i + 17 + nv])
                luts[(tc, th)] = _decode_lut(bits, vals)
                i += 17 + nv
        elif m == 0xC0 or m == 0xC1:                 # SOF0/1 (baseline)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X}) unsupported")
        elif m == 0xDD:                              # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:                              # SOS
            ns = body[0]
            smap = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                smap.append((cs, tt >> 4, tt & 0x0F))
            # entropy data runs until a non-RST, non-stuffed marker; a
            # stream that simply ENDS (EOI stripped / trailing lone byte)
            # keeps its final byte — `p + 1 < n` as the loop bound would
            # silently drop it and corrupt the last blocks
            start = pos
            p = pos
            while p < n:
                if (data[p] == 0xFF and p + 1 < n and data[p + 1] != 0x00
                        and not (0xD0 <= data[p + 1] <= 0xD7)):
                    break
                p += 1
            scans.append((smap, data[start:p], dri))
            pos = p
        # other segments (APPn, COM) are skipped
    if frame is None or not scans:
        raise JpegFormatError("missing SOF/SOS")
    fh, fw, comps = frame

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    # per-component coefficient store, (grid_h*grid_w, 64) zigzag order
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
    by_id = {c["id"]: c for c in comps}

    # a baseline stream may carry several scans (non-interleaved: one
    # component each) — decode every one into the shared coefficient
    # stores, each with the DRI in force at its SOS
    for smap, entropy, sdri in scans:
        _decode_scan(by_id, luts, smap, entropy, sdri,
                     mcus_x, mcus_y, fh, fw, hmax, vmax)

    # dequant + inverse zigzag + IDCT per component (vectorized)
    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise JpegFormatError(f"missing quant table {c['tq']}")
        # dequant in zigzag order (DQT tables are stored zigzag), then
        # zigzag → natural order: natural[j] = zz[_UNZIGZAG[j]]
        coef = (c["coef"].astype(np.float64) * qt[None, :])[:, _UNZIGZAG]
        blocks = coef.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT,
                        optimize=True) + 128.0
        plane = _unblockify(pix, c["bh"], c["bw"])
        # upsample to full-frame resolution
        if c["h"] != hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise JpegFormatError(f"{len(planes)}-component JPEG unsupported")
    return _ycbcr_to_rgb(*planes)
