"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
codec kernels for the formats decodable without external libraries.

Images/audio/video ride as Arrow ``binary`` columns with metadata columns
(media_type, width/height or sample_rate, etc.). Three codecs are fully
implemented here — they need only numpy / the Python stdlib:

- ``image/ppm``  — binary PPM (P6): header parse + raw RGB → (h, w, 3) uint8
- ``audio/wav``  — stdlib ``wave``: PCM16 frames → int16 samples
- ``video/raw``  — a documented toy container (``RAWV`` magic, w, h, n
  frames, then n raw RGB frames) standing in for a real demuxer

- ``image/png`` — REAL PNG codec over stdlib ``zlib``: IDAT inflate +
  per-scanline unfiltering (all 5 filter types), bit depth 8, color types
  gray/RGB/gray-alpha/RGBA, no interlace. Filter-0 encoder for tests.
- ``image/jpeg`` — REAL baseline JPEG codec (``stages/jpeg.py``): full
  ITU-T T.81 baseline sequential DCT decode (grayscale + YCbCr, 1/2
  sampling factors, restart markers) and a standards-compliant JFIF
  encoder (Annex K tables, 4:2:0 or 4:4:4, quality scaling) — numpy +
  stdlib only.
- ``image/gif`` — REAL GIF87a/89a codec (``stages/gif.py``): LZW decode,
  global/local palettes, interlace, animation frames with transparency +
  disposal compositing; exact-palette LZW encoder. A decoded GIF is
  ``(n_frames, h, w, 3)`` — animations flow through the video stages
  (``frame_sample``) as well as the image ones.

Audio/video compressed formats (MP3/MP4/...) genuinely require codec
libraries this container lacks; for those ``MediaDecoder`` raises
``NotImplementedError`` unless ``deterministic_fake=True`` (a seeded
content-derived fake so downstream plumbing stays exercisable). The
Ray-side shape is the real point at scale: actor-pool map_batches (codec
state loaded once per actor), SMALL batches sized by payload bytes not
rows, and only features — never payloads — flowing into any shuffle.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image/ppm", "audio/wav", "video/raw", ...
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),       # images/video
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()), # audio
    ("meta_n_frames", pa.int32()),    # video
])


# ---------------------------------------------------------------------------
# codecs (numpy / stdlib only)
# ---------------------------------------------------------------------------

def ppm_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def ppm_decode(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(parts[3], dtype=np.uint8,
                         count=h * w * 3).reshape(h, w, 3)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        raw = f.readframes(f.getnframes())
        sr = f.getframerate()
        x = np.frombuffer(raw, dtype="<i2")
        if f.getnchannels() > 1:
            x = x.reshape(-1, f.getnchannels()).mean(axis=1).astype(np.int16)
    return x, sr


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_encode(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 (c ∈ 1/2/3/4) → PNG bytes — stdlib zlib
    only: 8-bit depth, no interlace, filter 0 on every scanline, one IDAT.
    Any standards-compliant reader decodes the output."""
    import zlib
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + tag + body + \
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8),                    # filter byte 0
         img.astype(np.uint8).reshape(h, w * c)], axis=1).tobytes()
    return _PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 — stdlib zlib IDAT inflate + vectorized
    per-scanline unfiltering (all five filter types: None/Sub/Up/Average/
    Paeth). Supports bit depth 8, color types 0/2/4/6, no interlace — the
    overwhelmingly common web/PNG profile; anything else raises loudly
    (16-bit, palette and Adam7 need no new dependency but are out of
    scope until a pipeline needs them)."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"png_decode: bit depth {depth} "
                                 "unsupported (8 only)")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"png_decode: color type {ctype} "
                                 "unsupported (0/2/4/6)")
            if interlace:
                raise ValueError("png_decode: Adam7 interlace unsupported")
            meta = (w, h, _PNG_CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("png_decode: missing IHDR/IDAT")
    w, h, c = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode: IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)      # headroom for filter math
    out = np.zeros((h, stride), dtype=np.int64)
    lanes = data.reshape(h, w, c)
    for y in range(h):
        f = int(filters[y])
        row = lanes[y]                       # (w, c) view into data
        up = out[y - 1].reshape(w, c) if y else np.zeros((w, c), np.int64)
        if f == 0:                           # None
            rec = row
        elif f == 1:                         # Sub: cumsum over pixel lanes
            rec = np.cumsum(row, axis=0) % 256
        elif f == 2:                         # Up
            rec = (row + up) % 256
        elif f == 3:                         # Average (left is sequential)
            rec = np.empty((w, c), np.int64)
            left = np.zeros(c, np.int64)
            for x in range(w):
                left = (row[x] + (left + up[x]) // 2) % 256
                rec[x] = left
        elif f == 4:                         # Paeth (left is sequential)
            rec = np.empty((w, c), np.int64)
            left = np.zeros(c, np.int64)
            ul = np.zeros(c, np.int64)
            for x in range(w):
                p = left + up[x] - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up[x])
                pc_ = np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                np.where(pb <= pc_, up[x], ul))
                left = (row[x] + pred) % 256
                ul = up[x]
                rec[x] = left
        else:
            raise ValueError(f"png_decode: unknown filter {f}")
        out[y] = rec.reshape(stride)
    return out.astype(np.uint8).reshape(h, w, c)


def _as_rgb(img: np.ndarray) -> np.ndarray:
    """(h, w[, c]) uint8 → (h, w, 3): gray replicates, alpha drops."""
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:                               # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


_RAWV_MAGIC = b"RAWV"


def rawvideo_encode(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → toy raw-video container."""
    n, h, w, _ = frames.shape
    return _RAWV_MAGIC + struct.pack("<III", w, h, n) + \
        frames.astype(np.uint8).tobytes()


def rawvideo_decode(payload: bytes) -> np.ndarray:
    """Toy raw-video container → (n, h, w, 3) uint8."""
    if payload[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload, dtype=np.uint8, offset=16,
                         count=n * h * w * 3).reshape(n, h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize of (h, w, 3) uint8."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows][:, cols]


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Per-channel mean/std + 8-bin grayscale histogram, padded to dim."""
    gray = img.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0, 256))
    feats = np.concatenate([
        img.reshape(-1, 3).mean(axis=0) / 255.0,
        img.reshape(-1, 3).std(axis=0) / 255.0,
        hist / max(1, gray.size),
    ])
    out = np.zeros(dim)
    out[:min(dim, len(feats))] = feats[:dim]
    return out


def _audio_features(x: np.ndarray, sr: int, dim: int) -> np.ndarray:
    """RMS, zero-crossing rate, spectral centroid + 8-band log spectrum."""
    xf = x.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(xf ** 2))) if len(xf) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(xf))))) if len(xf) > 1 else 0.0
    spec = np.abs(np.fft.rfft(xf)) if len(xf) else np.zeros(1)
    freqs = np.fft.rfftfreq(max(len(xf), 1), 1.0 / sr)
    centroid = float((freqs * spec).sum() / spec.sum()) / (sr / 2) \
        if spec.sum() > 0 else 0.0
    bands = np.array_split(spec, 8)
    band_e = np.array([np.log1p(b.sum()) for b in bands])
    feats = np.concatenate([[rms, zcr, centroid], band_e])
    out = np.zeros(dim)
    out[:min(dim, len(feats))] = feats[:dim]
    return out


def _content_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

class MediaDecoder:
    """Actor-pool stage: payload → fixed-size feature vector.

    Codec dispatch lives in ``__init__`` (per-actor, once); real decode for
    image/ppm, image/png, audio/wav and video/raw; other media types raise
    unless ``deterministic_fake`` (module docstring)."""

    def __init__(self, feature_dim: int = 16, deterministic_fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = deterministic_fake

    def _decode_one(self, media_type: str, payload: bytes) -> np.ndarray:
        d = self.feature_dim
        payload = payload or b""
        if media_type == "image/ppm":
            return _image_features(ppm_decode(payload), d)
        if media_type == "image/png":
            return _image_features(_as_rgb(png_decode(payload)), d)
        if media_type == "image/jpeg":
            from saber_ray.stages.jpeg import jpeg_decode
            return _image_features(_as_rgb(jpeg_decode(payload)), d)
        if media_type == "audio/wav":
            return _audio_features(*wav_decode(payload), d)
        if media_type == "video/raw":
            frames = rawvideo_decode(payload)
            # mean over frames of per-frame image features
            return np.mean([_image_features(f, d) for f in frames], axis=0)
        if media_type == "image/gif":
            from saber_ray.stages.gif import gif_decode
            frames = gif_decode(payload)     # (n, h, w, 3): animation-aware
            return np.mean([_image_features(f, d) for f in frames], axis=0)
        if not self.fake:
            raise NotImplementedError(
                f"no codec for {media_type!r} in this environment "
                "(compressed formats need external libraries); use "
                "deterministic_fake=True for plumbing tests")
        return _content_rng(payload).standard_normal(d)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode_one(t, p)
                 for t, p in zip(df["media_type"], df["payload"])]
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "media_type": df["media_type"].to_numpy(),
            "feature": feats,
            "payload_bytes": df["payload"].map(lambda b: len(b or b"")).astype("int64"),
        })


def decode_features(media_ds, *, feature_dim: int = 16,
                    deterministic_fake: bool = False,
                    batch_size: int = 64, concurrency=(1, 32)):
    """payload → feature vectors. Small batch_size: batches are sized by
    payload bytes, not row count."""
    return media_ds.map_batches(
        MediaDecoder, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs=dict(feature_dim=feature_dim,
                                   deterministic_fake=deterministic_fake))


class ImageResizer:
    """Actor-pool stage: decode PPM/PNG/JPEG → nearest-neighbor resize →
    re-encode in the same container format."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from saber_ray.stages.jpeg import jpeg_decode, jpeg_encode
        out = []
        for t, p in zip(df["media_type"], df["payload"]):
            if t == "image/ppm":
                out.append(ppm_encode(resize_nearest(
                    ppm_decode(p), self.out_h, self.out_w)))
            elif t == "image/png":
                out.append(png_encode(resize_nearest(
                    png_decode(p), self.out_h, self.out_w)))
            elif t == "image/jpeg":
                out.append(jpeg_encode(resize_nearest(
                    _as_rgb(jpeg_decode(p)), self.out_h, self.out_w)))
            elif t == "image/gif":
                from saber_ray.stages.gif import gif_decode, gif_encode
                # nearest-neighbor SELECTS source pixels, so each frame's
                # palette only shrinks (a multi-palette animation re-encodes
                # with per-frame local tables); original per-frame delays
                # round-trip through the re-encode
                frames, delays = gif_decode(p, return_delays=True)
                out.append(gif_encode(np.stack(
                    [resize_nearest(f, self.out_h, self.out_w)
                     for f in frames]), delay_cs=delays))
            else:
                out.append(p)
        res = df.copy()
        res["payload"] = out
        is_img = df["media_type"].isin(["image/ppm", "image/png",
                                        "image/jpeg", "image/gif"])
        res["meta_width"] = np.where(is_img, self.out_w,
                                     df["meta_width"]).astype("int32")
        res["meta_height"] = np.where(is_img, self.out_h,
                                      df["meta_height"]).astype("int32")
        return res


def resize_images(media_ds, out_h: int, out_w: int, *, batch_size: int = 32,
                  concurrency=(1, 32)):
    return media_ds.map_batches(
        ImageResizer, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs=dict(out_h=out_h, out_w=out_w))


def frame_sample(media_ds, *, every_n: int = 10, batch_size: int = 16,
                 decode: bool = False):
    """Video frame sampling: one output row per sampled frame index; with
    ``decode=True``, video/raw payloads are demuxed and each sampled frame is
    re-emitted as a standalone image/ppm payload."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        n = df["meta_n_frames"].fillna(0).astype("int64").to_numpy()
        counts = np.maximum(0, (n + every_n - 1) // every_n)
        owners = np.repeat(np.arange(len(df)), counts)
        # csum[owners] offsets — safe when counts is length 0 (zero-row
        # block) or all-zero (no frames), unlike repeat of a 1-prefixed
        # cumsum which broadcasts length 1 vs 0
        csum = np.concatenate(([0], np.cumsum(counts)))
        offs = np.arange(int(counts.sum())) - csum[owners]
        frame_idx = (offs * every_n).astype("int64")
        out = {"media_id": df["media_id"].to_numpy()[owners],
               "frame_idx": frame_idx}
        if decode:
            payloads = df["payload"].to_numpy()
            types = df["media_type"].to_numpy()
            frames = []
            cache: dict[int, np.ndarray] = {}
            for o, fi in zip(owners, frame_idx):
                if types[o] == "video/raw":
                    if o not in cache:
                        cache[o] = rawvideo_decode(payloads[o])
                    frames.append(ppm_encode(cache[o][fi]))
                elif types[o] == "image/gif":
                    if o not in cache:
                        from saber_ray.stages.gif import gif_decode
                        cache[o] = gif_decode(payloads[o])
                    frames.append(ppm_encode(cache[o][fi]))
                else:
                    frames.append(None)
            out["frame_ppm"] = frames
        return pd.DataFrame(out)
    return media_ds.map_batches(f, batch_format="pandas", batch_size=batch_size)


def synthesize_media(n: int = 64, seed: int = 42, *,
                     include_png: bool = False,
                     include_jpeg: bool = False,
                     include_gif: bool = False,
                     img_px: tuple = (8, 48),
                     wav_samples: tuple = (200, 2000)) -> pa.Table:
    """Deterministic media table with REAL payloads (PPM / WAV / RAWV,
    plus PNG / JPEG / animated GIF when ``include_png`` / ``include_jpeg``
    / ``include_gif`` — kept opt-in so existing fixtures' type mix is
    unchanged). ``img_px`` / ``wav_samples`` size the payloads (defaults
    keep every existing fixture bit-identical; the bench passes bigger
    ranges so decode work dominates per-item overhead)."""
    from saber_ray.stages.jpeg import jpeg_encode
    rng = np.random.default_rng(seed)
    kinds = ["image/ppm", "audio/wav", "video/raw"] + \
        (["image/png"] if include_png else []) + \
        (["image/jpeg"] if include_jpeg else []) + \
        (["image/gif"] if include_gif else [])
    types = np.array(kinds)[rng.integers(0, len(kinds), size=n)]
    rows = {k: [] for k in ("payload", "w", "h", "sr", "nf")}
    for t in types:
        if t in ("image/ppm", "image/png", "image/jpeg"):
            h = int(rng.integers(img_px[0], img_px[1]))
            w = int(rng.integers(img_px[0], img_px[1]))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(yy * 255 // max(1, h - 1)),
                            (xx * 255 // max(1, w - 1)),
                            rng.integers(0, 256, (h, w))], axis=2).astype(np.uint8)
            rows["payload"].append(
                ppm_encode(img) if t == "image/ppm"
                else png_encode(img) if t == "image/png"
                else jpeg_encode(img))
            rows["w"].append(w); rows["h"].append(h)
            rows["sr"].append(0); rows["nf"].append(0)
        elif t == "image/gif":
            from saber_ray.stages.gif import gif_encode
            h = int(rng.integers(img_px[0], img_px[1]))
            w = int(rng.integers(img_px[0], img_px[1]))
            nf = int(rng.integers(2, 6))
            yy, xx = np.mgrid[0:h, 0:w]
            # palettized base (16x16 color levels = ≤256 colors); frames
            # roll the base so the animation shares ONE exact palette
            base = np.stack([(yy * 15 // max(1, h - 1)) * 17,
                             (xx * 15 // max(1, w - 1)) * 17,
                             np.full((h, w), int(rng.integers(0, 256)))],
                            axis=2).astype(np.uint8)
            gframes = np.stack([np.roll(base, f, axis=1)
                                for f in range(nf)])
            rows["payload"].append(gif_encode(gframes))
            rows["w"].append(w); rows["h"].append(h)
            rows["sr"].append(0); rows["nf"].append(nf)
        elif t == "audio/wav":
            sr = 16000
            dur = int(rng.integers(wav_samples[0], wav_samples[1]))
            tgrid = np.arange(dur) / sr
            freq = float(rng.uniform(100, 3000))
            x = (np.sin(2 * np.pi * freq * tgrid) * 12000
                 + rng.standard_normal(dur) * 500).astype(np.int16)
            rows["payload"].append(wav_encode(x, sr))
            rows["w"].append(0); rows["h"].append(0)
            rows["sr"].append(sr); rows["nf"].append(0)
        else:
            nf, h, w = int(rng.integers(2, 12)), 16, 16
            frames = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8) // 2 \
                + np.linspace(0, 127, nf, dtype=np.uint8)[:, None, None, None]
            rows["payload"].append(rawvideo_encode(frames.astype(np.uint8)))
            rows["w"].append(w); rows["h"].append(h)
            rows["sr"].append(0); rows["nf"].append(nf)
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "media_type": pa.array(types, type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "meta_width": pa.array(np.array(rows["w"], dtype=np.int32)),
        "meta_height": pa.array(np.array(rows["h"], dtype=np.int32)),
        "meta_sample_rate": pa.array(np.array(rows["sr"], dtype=np.int32)),
        "meta_n_frames": pa.array(np.array(rows["nf"], dtype=np.int32)),
    })


# ---------------------------------------------------------------------------
# audio DSP: log-mel spectrogram (real kernel, numpy-only — no codec libs)
# ---------------------------------------------------------------------------

def hann_window(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale), shape
    (n_mels, n_fft//2 + 1). Pure numpy; precompute once per (sr, n_fft,
    n_mels) in the actor."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64)
                                 / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_f = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_f - lo) / max(ctr - lo, 1e-12)
        down = (hi - bin_f) / max(hi - ctr, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def logmel_frames(x: np.ndarray, sr: int, *, n_fft: int, hop: int,
                  fb: np.ndarray) -> np.ndarray:
    """(n_frames, n_mels) log-mel energies for one int16 signal. All
    frames FFT'd in ONE batched rfft (2-D input) — no per-frame loop."""
    xf = x.astype(np.float64) / 32768.0
    if len(xf) < n_fft:
        return np.zeros((0, fb.shape[0]))
    n_frames = 1 + (len(xf) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xf[idx] * hann_window(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    return np.log1p(power @ fb.T)


class MelSpectrogram:
    """Actor-pool stage: WAV payload → pooled log-mel feature vector
    (mean and std per mel band → 2*n_mels floats) + frame count. The
    filterbank/window are cached per (sr) in the actor; every payload's
    frames go through one batched rfft. Non-WAV rows raise (dispatch
    upstream with a filter) — the compressed-codec boundary is unchanged."""

    def __init__(self, n_fft: int = 512, hop: int = 256, n_mels: int = 40):
        self.n_fft, self.hop, self.n_mels = n_fft, hop, n_mels
        self._fb: dict[int, np.ndarray] = {}

    def _one(self, media_type: str, payload: bytes) -> tuple:
        if media_type != "audio/wav":
            raise NotImplementedError(
                f"mel_spectrogram needs audio/wav, got {media_type!r}")
        x, sr = wav_decode(payload or b"")
        fb = self._fb.get(sr)
        if fb is None:
            fb = self._fb[sr] = mel_filterbank(sr, self.n_fft, self.n_mels)
        m = logmel_frames(x, sr, n_fft=self.n_fft, hop=self.hop, fb=fb)
        if m.shape[0] == 0:
            return np.zeros(2 * self.n_mels), 0
        return np.concatenate([m.mean(axis=0), m.std(axis=0)]), m.shape[0]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats, nframes = [], []
        for t, p in zip(df["media_type"], df["payload"]):
            f, n = self._one(t, p)
            feats.append(f)
            nframes.append(n)
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "mel_feature": feats,
            "n_frames": np.asarray(nframes, dtype=np.int64),
        })


def mel_spectrogram(media_ds, *, n_fft: int = 512, hop: int = 256,
                    n_mels: int = 40, batch_size: int = 32,
                    concurrency=(1, 32)):
    """WAV rows → pooled log-mel features (2*n_mels list<double>) +
    n_frames. Filter to audio/wav upstream; batch small (payload-sized
    rows)."""
    return media_ds.map_batches(
        MelSpectrogram, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs=dict(n_fft=n_fft, hop=hop, n_mels=n_mels))
