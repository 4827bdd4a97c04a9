"""ROI coding (maxshift, codec/roi.py): region decodes at full fidelity,
background degrades by bg_shift, no mask is transmitted, containers carry
the shifts, and SNR-layer truncation burns ROI guard bits before ROI data.
"""

import numpy as np
import pytest

from wicca_tpu.codec import container as C
from wicca_tpu.codec.pipeline import decode, decode_at_level, encode
from wicca_tpu.codec.roi import apply_roi, band_mask
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _mask(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


def test_roi_region_exact_background_degraded():
    x = _img((3, 128, 128))
    stream = encode(x, levels=3, spec=QuantSpec(base_step=1.0))
    mask = _mask(128, 128, 32, 64, 40, 88)
    roi = apply_roi(stream, mask, bg_shift=3)
    assert roi.roi_shift >= 1 and roi.bg_shift == 3
    base = np.asarray(decode(stream))
    rec = np.asarray(decode(roi))
    # haar is block-structured (margin 0): ROI pixels decode IDENTICALLY
    np.testing.assert_array_equal(rec[..., 32:64, 40:88], base[..., 32:64, 40:88])
    out = np.ones((128, 128), bool)
    out[32:64, 40:88] = False
    p_bg = float(psnr(rec[..., out], base[..., out]))
    assert p_bg < 45.0, p_bg  # background visibly coarser (~6 dB per shift bit)


def test_roi_lossless_inside_region():
    x = _img((3, 96, 96), seed=1)
    stream = encode(x, levels=2, wavelet="legall5.3")
    mask = _mask(96, 96, 16, 48, 16, 80)
    roi = apply_roi(stream, mask, bg_shift=2)
    rec = np.asarray(decode(roi, emit_u8=True))
    # 5/3 influence margin is dilated into the mask: interior stays LOSSLESS
    np.testing.assert_array_equal(rec[..., 16:48, 16:80], x[..., 16:48, 16:80])
    assert not np.array_equal(rec, x)  # background did lose bits


def test_roi_container_roundtrip_and_size():
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    base_img = np.clip(
        128 + 60 * np.sin(xx / 7) + 50 * np.cos(yy / 5)
        + np.random.default_rng(2).normal(0, 20, (128, 128)),
        0, 255,
    ).astype(np.uint8)[None]
    stream = encode(base_img, levels=3, spec=QuantSpec(base_step=1.0))
    roi = apply_roi(stream, _mask(128, 128, 48, 80, 48, 80), bg_shift=3)
    blob = C.serialize(roi)
    assert blob[:4] == b"WCT6"
    back = C.deserialize(blob)
    assert back.roi_shift == roi.roi_shift and back.bg_shift == 3
    np.testing.assert_array_equal(np.asarray(decode(back)), np.asarray(decode(roi)))
    # the point of bg_shift: the ROI'd file is smaller than the plain one
    assert len(blob) < len(C.serialize(stream))


def test_roi_layered_truncation_protects_region():
    x = _img((1, 64, 64), seed=3)
    stream = encode(x, levels=2, spec=QuantSpec(base_step=1.0))
    roi = apply_roi(stream, _mask(64, 64, 16, 48, 16, 48), bg_shift=0)
    assert roi.roi_shift >= 2, "need guard bits for this test"
    blob = C.serialize(roi, quality_layers=3)
    trunc = C.deserialize(blob, max_layers=1)  # 2 layers missing
    assert trunc.roi_shift == roi.roi_shift - 2 and trunc.bg_shift == 2
    base = np.asarray(decode(stream))
    rec = np.asarray(decode(trunc))
    # truncation only burned guard bits inside the ROI: region still exact
    np.testing.assert_array_equal(rec[..., 16:48, 16:48], base[..., 16:48, 16:48])


def test_roi_truncation_beyond_guard_raises():
    x = _img((1, 64, 64), seed=4)
    stream = encode(x, levels=2, spec=QuantSpec(base_step=4.0))
    roi = apply_roi(stream, _mask(64, 64, 0, 16, 0, 16), bg_shift=0)
    layers = roi.roi_shift + 2
    if layers > 15:
        pytest.skip("guard too large to exceed within the layer cap")
    blob = C.serialize(roi, quality_layers=layers)
    with pytest.raises(ValueError, match="guard bits"):
        C.deserialize(blob, max_layers=1)


def test_roi_validation_errors():
    x = _img((1, 64, 64))
    stream = encode(x, levels=2)
    with pytest.raises(ValueError, match="mask shape"):
        apply_roi(stream, np.zeros((32, 32), bool))
    with pytest.raises(ValueError, match="empty"):
        apply_roi(stream, np.zeros((64, 64), bool))
    roi = apply_roi(stream, _mask(64, 64, 0, 8, 0, 8))
    with pytest.raises(ValueError, match="already"):
        apply_roi(roi, _mask(64, 64, 0, 8, 0, 8))
    with pytest.raises(ValueError, match="bg_shift"):
        apply_roi(stream, _mask(64, 64, 0, 8, 0, 8), bg_shift=9)


def test_roi_decode_at_level_works():
    x = _img((3, 64, 64), seed=5)
    stream = encode(x, levels=3)
    roi = apply_roi(stream, _mask(64, 64, 0, 32, 0, 32), bg_shift=2)
    half = np.asarray(decode_at_level(roi, 1, emit_u8=True))
    assert half.shape == (3, 32, 32) and half.dtype == np.uint8


def test_band_mask_geometry():
    m = _mask(64, 64, 0, 2, 0, 2)  # single coarse block corner
    bm = band_mask(m, 16, 16, 2, 0)
    assert bm[0, 0] and bm.sum() == 1
    bm_d = band_mask(m, 16, 16, 2, 1)  # dilated by 1
    assert bm_d.sum() == 4 and bm_d[1, 1]
    # tile-padded extent beyond the image is background
    bm_p = band_mask(np.ones((64, 64), bool), 20, 20, 2, 0)
    assert bm_p[:16, :16].all() and not bm_p[16:, :].any() and not bm_p[:, 16:].any()
