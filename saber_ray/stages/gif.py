"""GIF codec (GIF87a/89a) — numpy + pure stdlib, no external libraries.

The third real compressed-image codec next to the PNG (zlib) and baseline
JPEG (stages/jpeg.py) codecs, and the only one of the three that is an
ANIMATION container — a decoded GIF is ``(n_frames, h, w, 3)``, which
slots straight into the video-side stages (``frame_sample``,
per-frame features). GIF is LOSSLESS for palettized content, so
roundtrips on ≤256-color images are bit-exact — the tests exploit that.

Decoder (``gif_decode``):
- GIF87a and GIF89a, global and per-image local color tables, multiple
  image blocks (animation frames), frame offsets (left/top), interlaced
  images (4-pass row order), Graphic Control Extensions (transparency
  index + disposal methods 0-3: unspecified / keep / restore-background /
  restore-previous), multi-sub-block LZW data, deferred-clear streams
  (encoders that stop growing the table at 4096 without emitting CLEAR).
- Output is the COMPOSITED canvas after each frame (what a viewer shows),
  shape ``(n_frames, screen_h, screen_w, 3)`` uint8.
- Unsupported/corrupt structures raise ``GifFormatError``.

Encoder (``gif_encode``):
- exact-palette: frames must use ≤ 256 distinct colors (raise otherwise —
  quantization is a modeling choice, not a codec default), one global
  color table, real LZW compression with table reset at 4096, optional
  interlace, multi-frame with per-frame delay.

LZW is inherently sequential per code — the hot loops are Python over
codes (same honest bound as the JPEG entropy loop; the Ray side
parallelizes across payloads in the actor pool, never inside one).

Reference parity note: the reference engine has no binary/media types at
all (its type system is int/float/long columns only) — this module is
part of the §2.7/§2.8 training-data extensions, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW byte stream → index array of exactly n_pixels entries."""
    if not (2 <= min_code_size <= 8):
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader state: LSB-first across the whole buffer
    buf = np.frombuffer(data, dtype=np.uint8)
    nbits = len(buf) * 8
    out = np.empty(n_pixels, dtype=np.uint8)
    out_n = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            return -1                      # truncated: treat as end
        byte0 = pos >> 3
        # up to 3 bytes cover any ≤12-bit code at any alignment
        v = int(buf[byte0])
        if byte0 + 1 < len(buf):
            v |= int(buf[byte0 + 1]) << 8
        if byte0 + 2 < len(buf):
            v |= int(buf[byte0 + 2]) << 16
        v = (v >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return v

    # table: list of byte strings; entries 0..clear-1 are roots
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]

    width = min_code_size + 1
    table = list(roots)
    prev: bytes | None = None
    while True:
        c = read_code(width)
        if c == -1 or c == end:
            break
        if c == clear:
            width = min_code_size + 1
            table = list(roots)
            prev = None
            continue
        if prev is None:                   # first code after (implied) clear
            if c >= len(table):
                raise GifFormatError("LZW: first code not a root")
            entry = table[c]
        elif c < len(table):
            entry = table[c]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif c == len(table):              # KwKwK
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise GifFormatError("LZW: code beyond table")
        if out_n + len(entry) > n_pixels:
            entry = entry[:n_pixels - out_n]   # over-full stream: clip
        out[out_n:out_n + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        out_n += len(entry)
        if out_n >= n_pixels:
            break
        # deferred clear: at 4096 the table stops growing, width stays 12
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if out_n < n_pixels:
        raise GifFormatError(
            f"LZW: stream ended at {out_n}/{n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Index array → GIF LZW byte stream (with CLEAR resets at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    acc_n = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, acc_n
        acc |= code << acc_n
        acc_n += width
        while acc_n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_n -= 8

    width = min_code_size + 1
    table: dict = {}
    next_code = end + 1
    emit(clear, width)
    seq = indices.astype(np.int64)
    cur = int(seq[0])
    for k in seq[1:]:
        k = int(k)
        key = (cur, k)
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        emit(cur, width)
        table[key] = next_code
        next_code += 1
        # encoder bumps one code LATER than the decoder: the decoder adds
        # this entry only after reading the NEXT code, so its width grows
        # at next_code == 2^w while ours grows at 2^w + 1 — the classic
        # LZW parity point (hand-traced in tests/test_gif.py)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            width = min_code_size + 1
            table = {}
            next_code = end + 1
        cur = k
    emit(cur, width)
    emit(end, width)
    if acc_n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Rows in 4-pass interlace order → natural order."""
    h = rows.shape[0]
    order = np.concatenate([np.arange(first, h, step)
                            for first, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(first, h, step)
                           for first, step in _INTERLACE_PASSES])


def gif_decode(payload: bytes, *, return_delays: bool = False):
    """GIF bytes → composited frames ``(n_frames, h, w, 3)`` uint8.

    With ``return_delays=True`` also returns the per-frame delay array
    (centiseconds, 0 where no Graphic Control Extension set one) so a
    re-encode can round-trip animation timing."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF payload")
    if len(payload) < 13:
        raise GifFormatError("truncated GIF header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) != 3 * n:
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    # canvas starts at the background color (or black without a GCT)
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    transparent = -1
    disposal = 0
    delay = 0
    delays: list[int] = []
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:                            # trailer
            break
        if block == 0x21:                            # extension
            if pos >= n:
                raise GifFormatError("truncated extension")
            label = payload[pos]
            pos += 1
            subs = []
            while pos < n and payload[pos] != 0:
                ln = payload[pos]
                subs.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1                                 # sub-block terminator
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                gce = subs[0]                        # Graphic Control Ext
                flags = gce[0]
                disposal = (flags >> 2) & 0x07
                transparent = gce[3] if flags & 0x01 else -1
                delay = struct.unpack("<H", gce[1:3])[0]
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        if pos + 9 > n:
            raise GifFormatError("truncated image descriptor")
        left, top, iw, ih, ipacked = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:                           # local color table
            cn = 2 << (ipacked & 0x07)
            raw = payload[pos:pos + 3 * cn]
            if len(raw) != 3 * cn:
                raise GifFormatError("truncated local color table")
            ct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            pos += 3 * cn
        if ct is None:
            raise GifFormatError("image without any color table")
        if pos >= n:
            raise GifFormatError("truncated image data")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while pos < n and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), mcs, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise GifFormatError("pixel index beyond color table")
        if left + iw > sw or top + ih > sh:
            raise GifFormatError("frame exceeds logical screen")
        saved = canvas[top:top + ih, left:left + iw].copy() \
            if disposal == 3 else None
        region = canvas[top:top + ih, left:left + iw]
        rgb = ct[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        delay = 0
        if disposal == 2:                            # restore background
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif disposal == 3 and saved is not None:    # restore previous
            canvas[top:top + ih, left:left + iw] = saved
        disposal = 0
        transparent = -1
    if not frames:
        raise GifFormatError("GIF contains no image data")
    if return_delays:
        return np.stack(frames), np.asarray(delays, dtype=np.int64)
    return np.stack(frames)


def _palette_of(flat: np.ndarray, what: str):
    """(m, 3) uint8 pixels → (colors int64 array, inverse indices)."""
    packed = (flat[:, 0].astype(np.int64) << 16) \
        | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2].astype(np.int64)
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"gif_encode: {len(colors)} distinct colors (>256) in "
            f"{what} — quantize first (exact-palette codec)")
    return colors, inverse


def _palette_bytes(colors: np.ndarray) -> tuple[bytes, int, int]:
    """colors → (padded table bytes, size-bits, min code size)."""
    bits = max(1, int(len(colors) - 1).bit_length())
    ct_n = 1 << bits
    palette = np.zeros((ct_n, 3), dtype=np.uint8)
    palette[:len(colors), 0] = (colors >> 16) & 0xFF
    palette[:len(colors), 1] = (colors >> 8) & 0xFF
    palette[:len(colors), 2] = colors & 0xFF
    return palette.tobytes(), bits, max(2, bits)


def gif_encode(frames: np.ndarray, *, delay_cs=4,
               interlace: bool = False) -> bytes:
    """``(h, w, 3)`` or ``(n, h, w, 3)`` uint8 → GIF89a bytes.

    Exact-palette: EACH FRAME must use ≤ 256 distinct colors (raises
    otherwise — quantization belongs to the pipeline, not the codec), so
    decode(encode(x)) is BIT-EXACT. When all frames together fit one
    palette it is written as a global color table; otherwise each frame
    gets its own LOCAL color table (legal GIF, and exactly what
    re-encoding a decoded multi-palette animation needs). Multi-frame
    inputs become an animation with ``delay_cs`` (1/100 s) between
    frames — an int for a uniform delay or a per-frame sequence (as
    returned by ``gif_decode(..., return_delays=True)``)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("gif_encode expects (h,w,3) or (n,h,w,3) uint8")
    nf, h, w, _ = frames.shape
    if h == 0 or w == 0 or nf == 0:
        raise ValueError("gif_encode: empty input")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("gif_encode: dimensions exceed GIF's 16-bit limit")
    delays = np.full(nf, delay_cs, dtype=np.int64) \
        if np.isscalar(delay_cs) else np.asarray(delay_cs, dtype=np.int64)
    if delays.shape != (nf,):
        raise ValueError(f"delay_cs: expected scalar or {nf} entries")

    flat = frames.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.int64) << 16) \
        | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2].astype(np.int64)
    global_ok = len(np.unique(packed)) <= 256

    out = bytearray(b"GIF89a")
    if global_ok:
        colors, inverse = _palette_of(flat, "the image")
        pal, bits, mcs = _palette_bytes(colors)
        out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
        out += pal
        per_frame = [(inverse.astype(np.uint8).reshape(nf, h, w)[f],
                      None, mcs) for f in range(nf)]
    else:
        # per-frame LOCAL color tables: no global table at all
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)
        per_frame = []
        for f in range(nf):
            colors, inverse = _palette_of(frames[f].reshape(-1, 3),
                                          f"frame {f}")
            pal, bits, mcs = _palette_bytes(colors)
            per_frame.append((inverse.astype(np.uint8).reshape(h, w),
                              (pal, bits), mcs))

    for f, (idx, local, mcs) in enumerate(per_frame):
        if nf > 1:
            # Graphic Control Extension: delay, no transparency, keep
            out += bytes([0x21, 0xF9, 4, 0x04]) \
                + struct.pack("<H", int(delays[f])) + bytes([0, 0])
        ipacked = 0x40 if interlace else 0x00
        if local is not None:
            ipacked |= 0x80 | ((local[1] - 1) & 0x07)
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        if local is not None:
            out += local[0]
        if interlace:
            idx = idx[_interlace_order(h)]
        out += bytes([mcs])
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
