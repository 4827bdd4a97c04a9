import numpy as np
import pytest

from tests.oracle import oracle_pad
from wicca_tpu.core.pad import normalize_border_mode, pad_amounts, pad_to_multiple, unpad

MODES = ["replicate", "constant", "reflect", "reflect101", "wrap"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape", [(7, 5), (8, 8), (13, 17), (32, 31)])
@pytest.mark.parametrize("ratio", [2, 4, 8])
def test_pad_matches_oracle(mode, shape, ratio):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    want = oracle_pad(img, ratio, mode, constant=7)
    # planar layout: move channels to front, pad trailing two dims
    got = np.asarray(pad_to_multiple(np.moveaxis(img, -1, 0), ratio, mode, constant=7))
    assert got.shape[-2] % ratio == 0 and got.shape[-1] % ratio == 0
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want)


def test_pad_noop_when_aligned():
    img = np.zeros((16, 32), dtype=np.uint8)
    out = pad_to_multiple(img, 8)
    assert out.shape == (16, 32)


def test_pad_matches_cv2_enums_and_unpad():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for cv2_enum, mode in [
        (cv2.BORDER_REPLICATE, "replicate"),
        (cv2.BORDER_CONSTANT, "constant"),
        (cv2.BORDER_REFLECT, "reflect"),
        (cv2.BORDER_REFLECT_101, "reflect101"),
        (cv2.BORDER_WRAP, "wrap"),
    ]:
        assert normalize_border_mode(cv2_enum) == mode
        dr, dc = pad_amounts(11, 13, 8)
        want = cv2.copyMakeBorder(img, 0, dr, 0, dc, cv2_enum, None, [7, 7, 7])
        got = np.asarray(pad_to_multiple(np.moveaxis(img, -1, 0), 8, mode, constant=7))
        np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want, err_msg=mode)
        np.testing.assert_array_equal(np.asarray(unpad(got, 11, 13)), np.moveaxis(img, -1, 0))


def test_bad_inputs():
    with pytest.raises(ValueError):
        pad_to_multiple(np.zeros((4, 4)), 0)
    with pytest.raises(ValueError):
        normalize_border_mode("bogus")
    with pytest.raises(ValueError):
        normalize_border_mode(99)
