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
