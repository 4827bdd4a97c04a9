"""Property tests from SURVEY.md §4: closed forms, energy/mean preservation,
pad/transform commutation, and the tiled+quantized combination."""

import numpy as np
import pytest

from tests.oracle import oracle_icon
from wicca_tpu.core.haar import block_mean_ll, dwt2, haar_icon
from wicca_tpu.core.pad import pad_to_multiple
from wicca_tpu.core.quant import QuantSpec, dequantize_pyramid, quantize_pyramid


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def test_mean_preservation():
    # block averaging preserves the global mean exactly (dims aligned)
    x = _img((1, 64, 64), seed=1).astype(np.float32)
    ll = np.asarray(block_mean_ll(x, 3))
    np.testing.assert_allclose(ll.mean(), x.mean(), rtol=1e-6)


def test_energy_partition():
    # image normalization: ||x||^2 = sum over subbands of 4^level * ||b||^2
    x = _img((1, 64, 64), seed=2).astype(np.float32)
    pyr = dwt2(x, 2)
    e = 4.0**2 * np.sum(np.asarray(pyr.ll) ** 2)
    for lvl, bands in enumerate(pyr.details, start=1):
        for b in bands:
            e += 4.0**lvl * np.sum(np.asarray(b) ** 2)
    np.testing.assert_allclose(e, np.sum(x**2), rtol=1e-5)


def test_downsampleable_constant_closed_form():
    # 2^d-downsampleable constant blocks reduce to their block values
    blocks = np.arange(16, dtype=np.float32).reshape(4, 4) * 10
    x = np.kron(blocks, np.ones((8, 8), np.float32))[None]
    ll = np.asarray(block_mean_ll(x, 3))
    np.testing.assert_array_equal(ll[0], blocks)


def test_pad_then_transform_equals_transform_of_padded():
    img = _img((3, 37, 51), seed=3)
    padded = np.asarray(pad_to_multiple(img, 8))
    a = np.asarray(haar_icon(img, 3))
    b = np.asarray(haar_icon(padded, 3))
    np.testing.assert_array_equal(a, b)


def test_icon_idempotent_on_aligned():
    # depth-(a+b) icon == depth-b float chain of depth-a LL (no intermediate
    # uint8 quantization in either path)
    x = _img((1, 64, 64), seed=4).astype(np.float32)
    direct = np.asarray(block_mean_ll(x, 4))
    chained = np.asarray(block_mean_ll(np.asarray(block_mean_ll(x, 2)), 2))
    np.testing.assert_array_equal(direct, chained)


def test_oracle_vs_uint8_intermediate_differs():
    # sanity that the oracle catches quantization-order bugs: re-quantizing
    # to uint8 mid-chain generally changes the result
    img = _img((40, 40, 3), seed=5)
    two_step = oracle_icon(oracle_icon(img, 1), 1)
    one_step = oracle_icon(img, 2)
    assert (two_step != one_step).any()


@pytest.mark.parametrize("wavelet", ["haar", "bior4.4"])
def test_tiled_transform_plus_quantization(wavelet):
    import jax

    from wicca_tpu.core.metrics import psnr
    from wicca_tpu.parallel.mesh import make_mesh
    from wicca_tpu.parallel.tiled import tiled_dwt2, tiled_idwt2

    mesh = make_mesh(ty=2, tx=4)
    img = _img((1, 128, 128), seed=6)
    spec = QuantSpec(base_step=1.0)

    @jax.jit
    def roundtrip(x):
        pyr = tiled_dwt2(x, 2, wavelet, mesh=mesh)
        return tiled_idwt2(dequantize_pyramid(quantize_pyramid(pyr, spec), spec), mesh=mesh)

    rec = np.asarray(roundtrip(img))
    assert rec.shape == img.shape
    assert float(psnr(rec, img.astype(np.float32))) > 35.0
