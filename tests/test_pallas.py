"""Pallas kernels vs the jnp core, in interpreter mode on CPU (the same
kernels run compiled on TPU; bench.py covers that)."""

import numpy as np
import pytest

from wicca_tpu.core.haar import dwt2_level, haar_icon, idwt2_level
from wicca_tpu.ops.dwt_pallas import (
    dwt_level_quant_pallas,
    icon_pallas,
    idwt_level_dequant_pallas,
)


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("depth", [1, 2, 3, 4, 5])
def test_icon_pallas_bit_exact(depth):
    x = _rand_img((3, 96, 160), seed=depth)
    want = np.asarray(haar_icon(x, depth))
    got = np.asarray(icon_pallas(x, depth))
    np.testing.assert_array_equal(got, want)


def test_icon_pallas_odd_dims():
    x = _rand_img((3, 101, 173), seed=1)
    want = np.asarray(haar_icon(x, 4))
    got = np.asarray(icon_pallas(x, 4))
    assert got.shape == want.shape == (3, 7, 11)
    np.testing.assert_array_equal(got, want)


def test_icon_pallas_batched():
    x = _rand_img((2, 3, 64, 64), seed=2)
    want = np.asarray(haar_icon(x, 3))
    np.testing.assert_array_equal(np.asarray(icon_pallas(x, 3)), want)


def test_dwt_level_pallas_unquantized_matches_core():
    x = _rand_img((3, 64, 128), seed=3).astype(np.float32)
    ll, lh, hl, hh = dwt_level_quant_pallas(x, quantize=False)
    cll, clh, chl, chh = dwt2_level(x)
    for got, want in [(ll, cll), (lh, clh), (hl, chl), (hh, chh)]:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dwt_idwt_pallas_roundtrip_unquantized():
    x = _rand_img((1, 64, 64), seed=4).astype(np.float32)
    ll, lh, hl, hh = dwt_level_quant_pallas(x, quantize=False)
    rec = np.asarray(idwt_level_dequant_pallas(ll, lh, hl, hh, quantize=False))
    np.testing.assert_array_equal(rec, x)


def test_dwt_pallas_quantized_roundtrip_error():
    x = _rand_img((1, 128, 128), seed=5).astype(np.float32)
    step = 2.0
    ll, lh, hl, hh = dwt_level_quant_pallas(x, step=step, quantize=True)
    assert lh.dtype == np.int8
    rec = np.asarray(idwt_level_dequant_pallas(ll, lh, hl, hh, step=step, quantize=True))
    # LL lossless + details quantized with step -> bounded reconstruction error
    cll, clh, chl, chh = dwt2_level(x)
    np.testing.assert_array_equal(np.asarray(ll), np.asarray(cll))
    assert np.max(np.abs(rec - x)) <= 4 * step


def test_dwt_pallas_odd_raises():
    with pytest.raises(ValueError):
        dwt_level_quant_pallas(np.zeros((1, 7, 8), np.float32))


def test_multilevel_matches_chained_levels():
    from wicca_tpu.ops.dwt_pallas import dwt_multilevel_quant_pallas, idwt_multilevel_dequant_pallas

    x = _rand_img((3, 64, 128), seed=7)
    steps = (1.0, 2.0, 4.0)
    ll_m, dets_m = dwt_multilevel_quant_pallas(x, steps)
    # chained single-level path on the f32 cast
    cur = x.astype(np.float32)
    chained = []
    for s in steps:
        cur, lh, hl, hh = dwt_level_quant_pallas(cur, step=s, quantize=True)
        chained.append((lh, hl, hh))
    np.testing.assert_array_equal(np.asarray(ll_m), np.asarray(cur))
    from wicca_tpu.ops.dwt_pallas import detail_is_transposed

    for lvl, ((a, b, c), (x2, y2, z2)) in enumerate(zip(dets_m, chained), start=1):
        # fine levels are stored transposed (internal layout optimization)
        t = (lambda m: m.swapaxes(-1, -2)) if detail_is_transposed(lvl) else (lambda m: m)
        np.testing.assert_array_equal(np.asarray(a), t(np.asarray(x2)))
        np.testing.assert_array_equal(np.asarray(b), t(np.asarray(y2)))
        np.testing.assert_array_equal(np.asarray(c), t(np.asarray(z2)))
    # fused inverse matches chained inverse
    rec_m = np.asarray(idwt_multilevel_dequant_pallas(ll_m, dets_m, steps))
    rec_c = np.asarray(cur)
    for s, (lh, hl, hh) in zip(reversed(steps), reversed(chained)):
        rec_c = np.asarray(idwt_level_dequant_pallas(rec_c, lh, hl, hh, step=s, quantize=True))
    np.testing.assert_array_equal(rec_m, rec_c)
    # u8 emission
    rec_u8 = np.asarray(idwt_multilevel_dequant_pallas(ll_m, dets_m, steps, emit_u8=True))
    assert rec_u8.dtype == np.uint8
    np.testing.assert_array_equal(rec_u8, np.clip(rec_m, 0, 255).astype(np.int32).astype(np.uint8))
