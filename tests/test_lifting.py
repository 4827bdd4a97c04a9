"""Lossless integer-lifting Haar (the BASELINE bit-exact anchor) and the
db2 / bior4.4 float lifting wavelets."""

import numpy as np
import pytest

from wicca_tpu.core.haar import Pyramid
from wicca_tpu.core.lifting import (
    cdf97_fwd1d,
    cdf97_inv1d,
    db2_fwd1d,
    db2_inv1d,
    dwt2_lifting,
    haar_int_fwd1d,
    haar_int_inv1d,
    idwt2_lifting,
    lifting_wavelets,
    register_wavelet,
)


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("depth", [1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("shape", [(64, 64, 3), (37, 53, 3), (512, 512)])
def test_integer_haar_roundtrip_bit_exact(depth, shape):
    img = _rand_img(shape, seed=depth)
    x = np.moveaxis(img, -1, 0) if img.ndim == 3 else img
    pyr = dwt2_lifting(x, depth, "haar_int")
    rec = np.asarray(idwt2_lifting(pyr))
    assert rec.dtype == np.int32
    np.testing.assert_array_equal(rec, x.astype(np.int32))


def test_integer_haar_1d_negative_values():
    x = np.array([[-5, 3, -2, 7, 0, -255, 255, 1]], dtype=np.int32)
    s, d = haar_int_fwd1d(x)
    np.testing.assert_array_equal(np.asarray(haar_int_inv1d(s, d)), x)
    # s is the floor average
    np.testing.assert_array_equal(np.asarray(s), np.floor((x[:, 0::2] + x[:, 1::2]) / 2).astype(np.int32))


def test_integer_haar_ll_close_to_block_mean():
    img = _rand_img((64, 64), seed=2)
    pyr = dwt2_lifting(img, 3, "haar_int")
    block = img.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    # floor-average chain differs from true mean by < 2 per level
    assert np.max(np.abs(np.asarray(pyr.ll) - block)) < 2 * 3


@pytest.mark.parametrize("wavelet", ["db2", "bior4.4"])
@pytest.mark.parametrize("depth", [1, 2, 3])
def test_float_lifting_roundtrip(wavelet, depth):
    img = _rand_img((96, 80, 3), seed=depth).astype(np.float32)
    x = np.moveaxis(img, -1, 0)
    pyr = dwt2_lifting(x, depth, wavelet)
    rec = np.asarray(idwt2_lifting(pyr))
    np.testing.assert_allclose(rec, x, atol=2e-3, rtol=1e-6)


@pytest.mark.parametrize("fwd,inv", [(db2_fwd1d, db2_inv1d), (cdf97_fwd1d, cdf97_inv1d)])
def test_1d_roundtrip_and_dc_gain(fwd, inv):
    rng = np.random.default_rng(0)
    x = rng.uniform(-100, 100, size=(4, 256)).astype(np.float32)
    s, d = fwd(x)
    np.testing.assert_allclose(np.asarray(inv(s, d)), x, atol=1e-3)
    # image normalization: constant signal -> s == constant, d == 0
    c = np.full((1, 128), 200.0, dtype=np.float32)
    s, d = fwd(c)
    np.testing.assert_allclose(np.asarray(s), 200.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)


def test_registry_and_extension_point():
    assert {"haar_int", "db2", "bior4.4"} <= set(lifting_wavelets())

    # user-defined wavelet (parity with reference WaveletCoder ABC extension,
    # SURVEY.md C1): trivial lazy wavelet
    def lazy_fwd(x):
        return x[..., 0::2], x[..., 1::2]

    def lazy_inv(s, d):
        out = np.empty((*s.shape[:-1], s.shape[-1] * 2), np.float32)
        import jax.numpy as jnp

        return jnp.stack([s, d], axis=-1).reshape(*s.shape[:-1], s.shape[-1] * 2)

    register_wavelet("lazy", lazy_fwd, lazy_inv)
    img = _rand_img((16, 16), seed=5).astype(np.float32)
    pyr = dwt2_lifting(img, 1, "lazy")
    np.testing.assert_array_equal(np.asarray(idwt2_lifting(pyr)), img)


def test_unknown_wavelet_raises():
    with pytest.raises(ValueError):
        dwt2_lifting(np.zeros((8, 8), np.float32), 1, "nope")


def test_pyramid_is_pytree():
    import jax

    img = _rand_img((32, 32), seed=1).astype(np.float32)
    pyr = dwt2_lifting(img, 2, "db2")
    leaves = jax.tree_util.tree_leaves(pyr)
    assert len(leaves) == 1 + 3 * 2
    doubled = jax.tree_util.tree_map(lambda a: a * 2, pyr)
    assert isinstance(doubled, Pyramid) and doubled.wavelet == "db2"


# ---------------------------------------------------------------------------
# LeGall 5/3 (JPEG2000 reversible filter)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("depth", [1, 2, 3, 5])
@pytest.mark.parametrize("shape", [(64, 64, 3), (37, 53, 3), (160, 96)])
def test_legall53_roundtrip_bit_exact(depth, shape):
    img = _rand_img(shape, seed=depth + 10)
    x = np.moveaxis(img, -1, 0) if img.ndim == 3 else img
    pyr = dwt2_lifting(x, depth, "legall5.3")
    rec = np.asarray(idwt2_lifting(pyr))
    assert rec.dtype == np.int32
    np.testing.assert_array_equal(rec, x.astype(np.int32))


def test_legall53_negative_and_extreme_values():
    from wicca_tpu.core.lifting import legall53_fwd1d, legall53_inv1d

    x = np.array([[-300, 3, -2, 255, 0, -255, 255, 1, 7, 7, 7, 7]], dtype=np.int32)
    s, d = legall53_fwd1d(x)
    np.testing.assert_array_equal(np.asarray(legall53_inv1d(s, d)), x)


def test_legall53_dc_gain_one():
    # constant image -> s band equals the constant at every level (DC gain 1)
    x = np.full((1, 32, 32), 113, dtype=np.int32)
    pyr = dwt2_lifting(x, 3, "legall5.3")
    np.testing.assert_array_equal(np.asarray(pyr.ll), np.full((1, 4, 4), 113))


def test_legall53_detail_bounds_fit_int16():
    # codec stores 5/3 / haar_int details as int16; verify the bound
    # empirically on adversarial inputs (checkerboard = worst-case highpass)
    cb = 255 * ((np.indices((128, 128)).sum(axis=0)) % 2).astype(np.int32)
    rng_img = _rand_img((128, 128), seed=99).astype(np.int32)
    for wavelet in ("legall5.3", "haar_int"):
        for img in (cb, rng_img):
            pyr = dwt2_lifting(img, 6, wavelet)
            for bands in pyr.details:
                for b in bands:
                    assert np.abs(np.asarray(b)).max() < 2**15


def test_integer_wavelet_registry():
    from wicca_tpu.core.lifting import is_integer_wavelet

    assert is_integer_wavelet("haar_int")
    assert is_integer_wavelet("legall5.3")
    assert is_integer_wavelet("cdf53")
    assert not is_integer_wavelet("db2")
    assert not is_integer_wavelet("haar")
