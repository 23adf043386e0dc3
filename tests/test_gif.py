"""GIF codec: LZW vs a hand-traced byte fixture, bit-exact roundtrips
(GIF is lossless on palettized content), interlace, animation compositing
(transparency + disposal), table growth past a CLEAR reset, error paths,
and the Ray actor-pool stages over a GIF-bearing corpus."""

import struct

import numpy as np
import pytest
import ray.data as rd

from saber_ray.stages.gif import (GifFormatError, _lzw_decode, _lzw_encode,
                                  gif_decode, gif_encode)
from saber_ray.stages.multimodal import (decode_features, frame_sample,
                                         ppm_decode, resize_images,
                                         synthesize_media)
from tests.oracle_util import to_pandas


# ---------------------------------------------------------------------------
# LZW: the width-bump parity point, pinned against a HAND-TRACED stream
# ---------------------------------------------------------------------------

def test_lzw_hand_traced_stream():
    """indices [0,1,1,0] at min_code_size=2: the canonical trace is
    codes [CLEAR=4@3, 0@3, 1@3, 1@3, 0@4, 5=END@4] — the encoder's width
    grows one code LATER (next==2^w+1) than the decoder's (next==2^w).
    The byte stream is packed LSB-first."""
    bits = []
    for code, width in [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]:
        bits.extend((code >> i) & 1 for i in range(width))
    by = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        by[i // 8] |= b << (i % 8)
    expected = bytes(by)
    assert _lzw_encode(np.array([0, 1, 1, 0], np.uint8), 2) == expected
    assert _lzw_decode(expected, 2, 4).tolist() == [0, 1, 1, 0]


def test_lzw_roundtrip_past_table_reset():
    """>4096 table entries forces the encoder's CLEAR reset and the
    decoder's full width ladder 9->12."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, 30_000).astype(np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 8), 8, len(idx))
    assert np.array_equal(out, idx)


def test_lzw_kwkwk_case():
    """c == next_code (the entry being defined) — aaa... streams hit it."""
    idx = np.zeros(50, np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, 50), idx)


# ---------------------------------------------------------------------------
# container roundtrips — bit-exact (lossless for palettized content)
# ---------------------------------------------------------------------------

def _palettized(h, w, seed=0, levels=6):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, levels, (h, w, 3)) * (255 // (levels - 1))) \
        .astype(np.uint8)


def test_single_frame_roundtrip_exact():
    for h, w in [(1, 1), (7, 13), (40, 33)]:
        img = _palettized(h, w, seed=h * w)
        dec = gif_decode(gif_encode(img))
        assert dec.shape == (1, h, w, 3)
        assert np.array_equal(dec[0], img)


def test_animation_roundtrip_exact():
    frames = np.stack([_palettized(20, 24, seed=s, levels=4)
                       for s in range(5)])
    dec = gif_decode(gif_encode(frames, delay_cs=10))
    assert dec.shape == frames.shape
    assert np.array_equal(dec, frames)


def test_interlaced_roundtrip_exact():
    img = _palettized(23, 17, seed=3)
    b_i = gif_encode(img, interlace=True)
    b_n = gif_encode(img)
    assert b_i != b_n                       # really took the other path
    assert np.array_equal(gif_decode(b_i), gif_decode(b_n))


def test_gif89a_structure():
    img = _palettized(10, 12, seed=1)
    b = gif_encode(img)
    assert b[:6] == b"GIF89a" and b[-1:] == b"\x3B"
    w, h = struct.unpack("<HH", b[6:10])
    assert (w, h) == (12, 10)


def test_palette_limit_raises():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)  # ~4.8k colors
    with pytest.raises(ValueError, match="256"):
        gif_encode(img)


def test_bad_payloads_raise_format_error():
    with pytest.raises(GifFormatError):
        gif_decode(b"NOTGIF" + b"\x00" * 20)
    img = _palettized(16, 16)
    b = gif_encode(img)
    with pytest.raises(GifFormatError):
        gif_decode(b[: len(b) // 2])        # truncated mid-image


# ---------------------------------------------------------------------------
# animation compositing: transparency + disposal, hand-built container
# ---------------------------------------------------------------------------

def _image_block(idx: np.ndarray, left: int, top: int, mcs: int) -> bytes:
    h, w = idx.shape
    out = bytearray(b"\x2C")
    out += struct.pack("<HHHHB", left, top, w, h, 0)
    out += bytes([mcs])
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        c = lzw[i:i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00"
    return bytes(out)


def _gce(disposal: int, transparent: int) -> bytes:
    flags = (disposal << 2) | (1 if transparent >= 0 else 0)
    return bytes([0x21, 0xF9, 4, flags, 0, 0,
                  max(0, transparent), 0])


def test_transparency_and_disposal_compositing():
    """Frame 2 is a 2x2 patch at (1,1) whose index 0 is TRANSPARENT with
    disposal=2 (restore background) declared for frame 1: the patch's
    transparent pixels show frame 1's canvas through; frame 3 (full, after
    the disposal) starts from a background-restored region."""
    # palette: 0=red 1=green 2=blue 3=white; background index 3
    pal = b"\xFF\x00\x00" + b"\x00\xFF\x00" + b"\x00\x00\xFF" \
        + b"\xFF\xFF\xFF"
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 3, 0) + pal
    f1 = np.full((4, 4), 0, np.uint8)                  # all red
    patch = np.array([[0, 1], [1, 0]], np.uint8)       # 0 = transparent
    f3 = np.full((4, 4), 2, np.uint8)                  # all blue
    payload = hdr \
        + _gce(disposal=2, transparent=-1) + _image_block(f1, 0, 0, 2) \
        + _gce(disposal=0, transparent=0) + _image_block(patch, 1, 1, 2) \
        + _image_block(f3, 0, 0, 2) + b"\x3B"
    dec = gif_decode(payload)
    assert dec.shape == (3, 4, 4, 3)
    red, green, blue, white = [np.array(c) for c in
                               [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                                (255, 255, 255)]]
    assert (dec[0] == red).all()
    # after frame 1's disposal=2 the whole canvas restores to background
    # (white); the patch then draws green at its non-transparent cells
    assert (dec[1][1, 2] == green).all() and (dec[1][2, 1] == green).all()
    assert (dec[1][1, 1] == white).all() and (dec[1][2, 2] == white).all()
    assert (dec[1][0, 0] == white).all()
    assert (dec[2] == blue).all()


# ---------------------------------------------------------------------------
# property: arbitrary palettized content roundtrips exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       nf=st.integers(1, 4), levels=st.integers(2, 6),
       interlace=st.booleans(),
       seed=st.integers(0, 2**31 - 1))
def test_gif_roundtrip_property(h, w, nf, levels, interlace, seed):
    rng = np.random.default_rng(seed)
    frames = (rng.integers(0, levels, (nf, h, w, 3))
              * (255 // (levels - 1))).astype(np.uint8)
    dec = gif_decode(gif_encode(frames, interlace=interlace))
    assert np.array_equal(dec, frames)


# ---------------------------------------------------------------------------
# Ray stages over a GIF-bearing corpus
# ---------------------------------------------------------------------------

def test_stages_over_gif_corpus(ray_session):
    src = synthesize_media(48, seed=9, include_gif=True)
    pdf = src.to_pandas()
    assert (pdf["media_type"] == "image/gif").any()
    media = rd.from_arrow(src)

    feats = to_pandas(decode_features(media, feature_dim=8))
    g = feats[feats["media_type"] == "image/gif"]
    arr = np.stack([np.asarray(v) for v in g["feature"]])
    assert np.isfinite(arr).all() and arr.std() > 0

    res = to_pandas(resize_images(rd.from_arrow(src), 12, 10))
    rg = res[res["media_type"] == "image/gif"]
    assert len(rg) > 0
    for p, nf in zip(rg["payload"], rg["meta_n_frames"]):
        d = gif_decode(p)
        assert d.shape == (nf, 12, 10, 3)
    assert (rg["meta_width"] == 10).all() and (rg["meta_height"] == 12).all()

    fs = to_pandas(frame_sample(rd.from_arrow(src), every_n=2, decode=True))
    gif_ids = set(pdf.loc[pdf["media_type"] == "image/gif", "media_id"])
    gfs = fs[fs["media_id"].isin(gif_ids)]
    assert len(gfs) > 0
    # each sampled gif frame decodes as the matching composited frame
    by_id = {int(r["media_id"]): gif_decode(r["payload"])
             for _, r in pdf[pdf["media_type"] == "image/gif"].iterrows()}
    for _, row in gfs.iterrows():
        want = by_id[int(row["media_id"])][int(row["frame_idx"])]
        assert np.array_equal(ppm_decode(row["frame_ppm"]), want)


def test_multi_palette_animation_local_tables():
    """Two frames whose palettes TOGETHER exceed 256 colors (each ≤ 256)
    must encode with per-frame local color tables and roundtrip exactly —
    the shape of a real-world animated GIF with per-frame palettes."""
    rng = np.random.default_rng(5)
    # frame 0: 256 distinct reds+greens; frame 1: 256 distinct blues
    f0 = np.zeros((16, 16, 3), np.uint8)
    f0[..., 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    f0[..., 1] = 7
    f1 = np.zeros((16, 16, 3), np.uint8)
    f1[..., 2] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    frames = np.stack([f0, f1])
    b = gif_encode(frames)
    dec = gif_decode(b)
    assert np.array_equal(dec, frames)
    # global color table flag must be OFF in the screen descriptor
    assert (b[10] & 0x80) == 0
    # a single >256-color FRAME still raises (its own frame index named)
    big = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    solid = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="frame 0"):
        gif_encode(np.stack([big, solid]))


def test_per_frame_delays_roundtrip():
    frames = np.stack([_palettized(8, 8, seed=s, levels=3)
                       for s in range(3)])
    b = gif_encode(frames, delay_cs=[10, 250, 3])
    dec, delays = gif_decode(b, return_delays=True)
    assert np.array_equal(dec, frames)
    assert delays.tolist() == [10, 250, 3]


def test_resizer_handles_multi_palette_gif_and_keeps_delays(ray_session):
    """Regression: ImageResizer used to crash on composited animations
    whose cross-frame palette union exceeds 256 colors, and silently
    replaced per-frame delays with the encoder default."""
    import pandas as pd
    from saber_ray.stages.multimodal import ImageResizer
    f0 = np.zeros((16, 16, 3), np.uint8)
    f0[..., 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    f1 = np.zeros((16, 16, 3), np.uint8)
    f1[..., 2] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = gif_encode(np.stack([f0, f1]), delay_cs=[33, 77])
    df = pd.DataFrame({
        "media_id": [1], "media_type": ["image/gif"],
        "payload": [payload], "meta_width": [16], "meta_height": [16],
        "meta_sample_rate": [0], "meta_n_frames": [2]})
    out = ImageResizer(8, 8)(df)
    dec, delays = gif_decode(out["payload"].iloc[0], return_delays=True)
    assert dec.shape == (2, 8, 8, 3)
    assert delays.tolist() == [33, 77]
