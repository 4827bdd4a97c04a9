"""Golden-value tests of the float Haar path vs the reference numerical
contract (SURVEY.md §2.3) and exact-roundtrip properties."""

import numpy as np
import pytest

from tests.oracle import oracle_icon
from wicca_tpu.core.haar import block_mean_ll, dwt2, dwt2_level, haar_icon, idwt2, idwt2_level


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("depth", [1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("shape", [(64, 64, 3), (37, 53, 3), (130, 97, 3)])
def test_icon_bit_exact_vs_oracle(depth, shape):
    img = _rand_img(shape, seed=depth)
    want = oracle_icon(img, depth)
    got = np.asarray(haar_icon(np.moveaxis(img, -1, 0), depth))
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want)


@pytest.mark.parametrize("mode", ["replicate", "constant", "reflect", "reflect101", "wrap"])
def test_icon_bit_exact_border_modes(mode):
    img = _rand_img((41, 29, 3), seed=7)
    want = oracle_icon(img, 3, mode=mode, constant=13)
    got = np.asarray(haar_icon(np.moveaxis(img, -1, 0), 3, mode=mode, constant=13))
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want)


def test_icon_grayscale_2d():
    # The reference de-facto crashes on 2-D input (SURVEY.md §2.3 quirk); we
    # support it: a 2-D array is just (H, W) planar data.
    img = _rand_img((40, 40))
    got = np.asarray(haar_icon(img, 2))
    want = oracle_icon(img[..., None], 2)[..., 0]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("depth", [1, 2, 3, 5])
def test_roundtrip_exact_uint8(depth):
    # float32 Haar roundtrip is bit-exact for integer inputs up to depth 8
    # (dyadic rationals fit the mantissa) — the float lossless anchor.
    img = _rand_img((96, 128, 3), seed=depth).astype(np.float32)
    x = np.moveaxis(img, -1, 0)
    pyr = dwt2(x, depth)
    rec = np.asarray(idwt2(pyr))
    np.testing.assert_array_equal(rec, x)


def test_roundtrip_crops_odd_shapes():
    img = _rand_img((51, 77, 3), seed=3).astype(np.float32)
    x = np.moveaxis(img, -1, 0)
    pyr = dwt2(x, 3)
    rec = np.asarray(idwt2(pyr))
    assert rec.shape == x.shape
    np.testing.assert_array_equal(rec, x)


def test_level_shapes_and_ll_equals_block_mean():
    x = _rand_img((32, 64, 3), seed=1).astype(np.float32)
    x = np.moveaxis(x, -1, 0)
    ll, lh, hl, hh = dwt2_level(x)
    assert ll.shape == (3, 16, 32) == lh.shape == hl.shape == hh.shape
    np.testing.assert_array_equal(np.asarray(ll), np.asarray(block_mean_ll(x, 1)))
    rec = np.asarray(idwt2_level(ll, lh, hl, hh))
    np.testing.assert_array_equal(rec, x)


def test_constant_image_closed_form():
    # block mean of a constant image is the constant at every depth; details 0
    x = np.full((1, 64, 64), 117.0, dtype=np.float32)
    pyr = dwt2(x, 4)
    np.testing.assert_array_equal(np.asarray(pyr.ll), np.full((1, 4, 4), 117.0, np.float32))
    for lh, hl, hh in pyr.details:
        assert not np.any(np.asarray(lh)) and not np.any(np.asarray(hl)) and not np.any(np.asarray(hh))


def test_linear_ramp_closed_form():
    # depth-1 LL of a horizontal ramp x[i,j]=j is 2j+0.5 block mean = (2j + 2j+1)/2
    w = 32
    x = np.tile(np.arange(w, dtype=np.float32), (8, 1))[None]
    ll = np.asarray(dwt2_level(x)[0])
    want = (np.arange(0, w, 2, dtype=np.float32) + 0.5)[None, None, :].repeat(4, axis=1)
    np.testing.assert_allclose(ll, np.broadcast_to(want, ll.shape))


def test_jit_icon_matches_eager():
    import jax

    img = _rand_img((33, 47, 3), seed=9)
    x = np.moveaxis(img, -1, 0)
    eager = np.asarray(haar_icon(x, 4))
    jitted = np.asarray(jax.jit(haar_icon, static_argnums=(1,))(x, 4))
    np.testing.assert_array_equal(eager, jitted)
