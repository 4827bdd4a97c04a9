"""Coder-class API parity + data-parallel batched codec."""

import numpy as np
import pytest

from tests.oracle import oracle_icon
from wicca_tpu.coder import HaarCoder, LiftingCoder, WaveletCoder
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.parallel.batch import depth_sweep_psnr, dp_encode_decode_psnr, dp_icons
from wicca_tpu.parallel.mesh import data_mesh


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def test_haar_coder_reference_parity():
    coder = HaarCoder()
    assert isinstance(coder, WaveletCoder)
    img = _img((75, 101, 3), seed=1)
    for depth in (1, 3, 5):
        got = coder.get_small_copy(img, depth)
        np.testing.assert_array_equal(got, oracle_icon(img, depth))


def test_haar_coder_border_enum_and_grayscale():
    cv2 = pytest.importorskip("cv2")
    coder = HaarCoder()
    img = _img((64, 64, 3), seed=2)
    got = coder.get_small_copy(img, 2, border_type=cv2.BORDER_REFLECT)
    np.testing.assert_array_equal(got, oracle_icon(img, 2, mode="reflect"))
    gray = _img((40, 56), seed=3)
    out = coder.get_small_copy(gray, 2)
    assert out.shape == (10, 14)


def test_lifting_coder():
    coder = LiftingCoder("bior4.4")
    img = _img((64, 64, 3), seed=4)
    icon = coder.get_small_copy(img, 3)
    assert icon.shape == (8, 8, 3) and icon.dtype == np.uint8
    with pytest.raises(ValueError):
        LiftingCoder("nope")


def test_dp_batch_codec():
    mesh = data_mesh()
    batch = _img((8, 3, 64, 64), seed=5)
    ps = np.asarray(dp_encode_decode_psnr(batch, 3, QuantSpec(base_step=1.0), mesh=mesh))
    assert ps.shape == (8,)
    assert (ps > 30.0).all()

    icons = np.asarray(dp_icons(batch, 2, mesh=mesh))
    assert icons.shape == (8, 3, 16, 16)
    from wicca_tpu.core.haar import haar_icon

    np.testing.assert_array_equal(icons, np.asarray(haar_icon(batch, 2)))


def test_depth_sweep():
    mesh = data_mesh()
    batch = _img((4, 1, 64, 64), seed=6)
    table = depth_sweep_psnr(batch, (1, 2, 3), mesh=mesh)
    assert set(table) == {1, 2, 3}
    assert all(v > 25.0 for v in table.values())
