"""Baseline JPEG codec tests: roundtrip fidelity, structural compliance,
decoder robustness (restart markers, odd dims, grayscale, subsampling),
and the image/jpeg wiring through MediaDecoder / ImageResizer."""

import numpy as np
import pytest
import ray.data as rd

from saber_ray.stages.jpeg import (JpegFormatError, jpeg_decode, jpeg_encode)
from saber_ray.stages.multimodal import (MediaDecoder, decode_features,
                                         resize_images, synthesize_media)
from tests.oracle_util import to_pandas


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)


def _smooth_image(h: int = 48, w: int = 64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
        yy * 255 / max(1, h - 1),
        xx * 255 / max(1, w - 1),
    ], axis=2).clip(0, 255).astype(np.uint8)


def test_roundtrip_fidelity_by_quality():
    img = _smooth_image()
    for q, sub, floor in [(95, False, 45.0), (85, True, 33.0),
                          (60, True, 30.0)]:
        dec = jpeg_decode(jpeg_encode(img, quality=q, subsample=sub))
        assert dec.shape == img.shape
        p = _psnr(img, dec)
        assert p > floor, (q, sub, p)
    # higher quality ⇒ larger file
    sizes = [len(jpeg_encode(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_uniform_color_exact():
    # a flat block is pure DC — quantization cannot disturb it beyond
    # colorspace rounding, which the 4:4:4 path keeps to 0 here
    uni = np.full((17, 23, 3), (200, 50, 90), np.uint8)
    dec = jpeg_decode(jpeg_encode(uni, quality=90, subsample=False))
    assert int(np.abs(dec.astype(int) - uni.astype(int)).max()) <= 1


def test_grayscale_and_2d_input():
    yy = np.mgrid[0:40, 0:56][0]
    g = (yy * 255 / 39).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(g, dec) > 45.0
    # (h, w, 1) input behaves like grayscale
    dec1 = jpeg_decode(jpeg_encode(g[:, :, None], quality=90))
    np.testing.assert_array_equal(dec1, dec)


def test_odd_dimensions_crop_exact():
    for h, w in [(33, 21), (8, 8), (9, 16), (1, 1), (7, 3)]:
        img = _smooth_image(h, w)
        dec = jpeg_decode(jpeg_encode(img, quality=90, subsample=True))
        assert dec.shape == (h, w, 3)


def test_restart_markers_bit_identical():
    img = _smooth_image()
    plain = jpeg_decode(jpeg_encode(img, quality=85, subsample=True))
    withrst = jpeg_decode(jpeg_encode(img, quality=85, subsample=True,
                                      restart_interval=2))
    np.testing.assert_array_equal(plain, withrst)


def test_file_structure_markers():
    enc = jpeg_encode(_smooth_image(16, 16), quality=80)
    assert enc[:2] == b"\xFF\xD8" and enc[-2:] == b"\xFF\xD9"
    assert b"JFIF\x00" in enc[:32]
    assert bytes([0xFF, 0xC0]) in enc           # SOF0 = baseline
    # SOF0 carries the true (unpadded) dimensions
    i = enc.index(bytes([0xFF, 0xC0]))
    h = int.from_bytes(enc[i + 5:i + 7], "big")
    w = int.from_bytes(enc[i + 7:i + 9], "big")
    assert (h, w) == (16, 16)


def test_decoder_rejects_non_baseline_and_garbage():
    with pytest.raises(JpegFormatError):
        jpeg_decode(b"not a jpeg")
    enc = bytearray(jpeg_encode(_smooth_image(16, 16)))
    i = enc.index(bytes([0xFF, 0xC0]))
    enc[i + 1] = 0xC2                            # masquerade as progressive
    with pytest.raises(JpegFormatError):
        jpeg_decode(bytes(enc))


def test_subsampled_chroma_is_half_resolution():
    # red/blue checkerboard at pixel scale: 4:2:0 must blur chroma while
    # 4:4:4 keeps it — detectable via reconstruction error
    img = np.zeros((16, 16, 3), np.uint8)
    img[::2, ::2, 0] = 255
    img[1::2, 1::2, 2] = 255
    e444 = _psnr(img, jpeg_decode(jpeg_encode(img, 95, subsample=False)))
    e420 = _psnr(img, jpeg_decode(jpeg_encode(img, 95, subsample=True)))
    assert e444 > e420 + 3.0


def test_media_decoder_jpeg_features(ray_session):
    media = rd.from_arrow(synthesize_media(36, seed=5, include_jpeg=True))
    src = synthesize_media(36, seed=5, include_jpeg=True).to_pandas()
    assert (src["media_type"] == "image/jpeg").any()
    out = to_pandas(decode_features(media, feature_dim=8))
    assert len(out) == 36
    jp = out[out["media_type"] == "image/jpeg"]
    feats = np.stack([np.asarray(v) for v in jp["feature"]])
    assert np.isfinite(feats).all() and feats.std() > 0


def test_resize_stage_reencodes_jpeg(ray_session):
    media = rd.from_arrow(synthesize_media(24, seed=5, include_jpeg=True))
    res = to_pandas(resize_images(media, 12, 10))
    jp = res[res["media_type"] == "image/jpeg"]
    assert len(jp) > 0
    for p in jp["payload"]:
        assert jpeg_decode(p).shape == (12, 10, 3)
    assert (jp["meta_width"] == 10).all() and (jp["meta_height"] == 12).all()


def test_jpeg_features_close_to_lossless_path():
    """The feature vector of a JPEG-compressed image stays close to the
    PPM (lossless) feature vector of the same pixels — decode is really
    reading the image, not hallucinating."""
    from saber_ray.stages.multimodal import ppm_encode
    img = _smooth_image(32, 32)
    dec = MediaDecoder(feature_dim=8)
    f_ppm = dec._decode_one("image/ppm", ppm_encode(img))
    f_jpg = dec._decode_one("image/jpeg", jpeg_encode(img, quality=90))
    np.testing.assert_allclose(f_jpg, f_ppm, atol=0.02)


def test_non_interleaved_scans_decode_identically():
    """A legal baseline file with one scan per component (non-interleaved,
    T.81 A.2.2 — e.g. libjpeg scan scripts) carries the same coefficients
    as the interleaved encoding, so the decoder must produce identical
    pixels. Regression: the decoder used to keep only the LAST scan and
    decode it with interleaved full-MCU geometry (silent corruption)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (45, 62, 3)).astype(np.uint8)
    for sub in (True, False):
        b_i = jpeg_encode(img, quality=90, subsample=sub)
        b_n = jpeg_encode(img, quality=90, subsample=sub, interleave=False)
        assert np.array_equal(jpeg_decode(b_i), jpeg_decode(b_n))
    # grayscale single-component scan goes through the same path
    g = img[:, :, 0]
    assert np.array_equal(
        jpeg_decode(jpeg_encode(g, quality=90, interleave=False)),
        jpeg_decode(jpeg_encode(g, quality=90)))


def test_non_interleaved_restart_markers():
    """In a non-interleaved scan the restart interval counts BLOCKS."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    b_nr = jpeg_encode(img, quality=90, restart_interval=3,
                       interleave=False)
    assert np.array_equal(jpeg_decode(b_nr),
                          jpeg_decode(jpeg_encode(img, quality=90)))


def test_truncated_entropy_raises_format_error():
    """Corrupt/short entropy data must surface as JpegFormatError, never a
    raw numpy IndexError escaping from the bit reader."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    b = jpeg_encode(img, quality=80)
    for frac in (0.3, 0.5, 0.7, 0.9):
        with pytest.raises(JpegFormatError):
            jpeg_decode(b[:int(len(b) * frac)])


def test_missing_eoi_keeps_last_entropy_byte():
    """EOI-stripped payloads (a truncation most decoders tolerate) decode
    to the SAME pixels — the scan-end search must not drop the final
    entropy byte when no terminating marker follows."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (37, 29, 3)).astype(np.uint8)
    b = jpeg_encode(img, quality=80)
    assert np.array_equal(jpeg_decode(b[:-2]), jpeg_decode(b))


# ---------------------------------------------------------------------------
# property tests: the codec must hold its contracts for ARBITRARY images —
# any shape (incl. 1-px edges and odd dims), any content, gray or color,
# any quality, interleaved or not, with or without restart markers
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _images(draw):
    h = draw(st.integers(min_value=1, max_value=40))
    w = draw(st.integers(min_value=1, max_value=40))
    gray = draw(st.booleans())
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    # mix smooth gradients with noise so both DC- and AC-heavy blocks occur
    base = np.linspace(0, 255, h * w).reshape(h, w)
    if not gray:
        base = np.stack([base, base[::-1], base], axis=2)
    noise_amp = draw(st.integers(min_value=0, max_value=128))
    img = np.clip(base.reshape(shape[:2] + ((3,) if not gray else ()))
                  + rng.integers(-noise_amp, noise_amp + 1, shape),
                  0, 255).astype(np.uint8)
    return img


@settings(max_examples=40, deadline=None)
@given(img=_images(),
       quality=st.integers(min_value=30, max_value=95),
       subsample=st.booleans(),
       interleave=st.booleans(),
       dri=st.sampled_from([0, 1, 3]))
def test_jpeg_roundtrip_properties(img, quality, subsample, interleave, dri):
    """Encode/decode holds for arbitrary shapes, content, and encoder
    options: shape preserved, decode deterministic, byte-stream
    deterministic, and reconstruction error bounded (RMSE over a
    lossy codec at quality>=30 stays far from random noise)."""
    b = jpeg_encode(img, quality=quality, subsample=subsample,
                    interleave=interleave, restart_interval=dri)
    assert b[:2] == b"\xFF\xD8" and b[-2:] == b"\xFF\xD9"
    dec = jpeg_decode(b)
    exp_shape = img.shape if img.ndim == 3 else img.shape[:2]
    assert dec.shape == exp_shape
    # determinism: same input -> same bytes -> same pixels
    assert jpeg_encode(img, quality=quality, subsample=subsample,
                       interleave=interleave, restart_interval=dri) == b
    assert np.array_equal(jpeg_decode(b), dec)
    # bounded loss: even full-range noise at quality 30 + 4:2:0 stays
    # near RMSE ~50; unrelated pixels would sit near ~104. The loose 70
    # bound catches geometry bugs that scramble blocks without crashing
    # while never flaking on legitimately noisy low-quality cases
    rmse = float(np.sqrt(np.mean(
        (dec.astype(np.float64) - img.astype(np.float64)) ** 2)))
    assert rmse < 70.0, rmse


@settings(max_examples=25, deadline=None)
@given(img=_images(), quality=st.integers(min_value=50, max_value=95))
def test_jpeg_scan_order_is_pixel_invariant(img, quality):
    """Interleaved and non-interleaved encodings carry the same
    coefficients, so decoded pixels must be IDENTICAL for any image."""
    a = jpeg_decode(jpeg_encode(img, quality=quality))
    b = jpeg_decode(jpeg_encode(img, quality=quality, interleave=False))
    assert np.array_equal(a, b)
