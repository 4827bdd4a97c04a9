import numpy as np
import pytest

from wicca_tpu.core.haar import dwt2, idwt2
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import (
    QuantSpec,
    dequantize_deadzone,
    dequantize_pyramid,
    quantize_deadzone,
    quantize_pyramid,
)


def test_deadzone_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    c = rng.uniform(-50, 50, size=(64, 64)).astype(np.float32)
    step = 2.0
    q = quantize_deadzone(c, step)
    rec = np.asarray(dequantize_deadzone(q, step))
    # midpoint reconstruction error <= step/2 outside the deadzone; the
    # doubled zero bin (-step, step) reconstructs to 0 with error < step
    err = np.abs(rec - c)
    near_zero = np.abs(c) < step
    assert np.max(err) <= step + 1e-5
    assert np.max(err[~near_zero]) <= step / 2 + 1e-5
    assert not np.any(np.asarray(q)[near_zero])


def test_deadzone_sign_symmetric():
    c = np.array([-3.7, 3.7, -0.2, 0.2, 0.0], dtype=np.float32)
    q = np.asarray(quantize_deadzone(c, 1.0))
    np.testing.assert_array_equal(q, [-3, 3, 0, 0, 0])


@pytest.mark.parametrize("base_step", [0.5, 2.0, 8.0])
def test_pyramid_quant_psnr(base_step):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(3, 128, 128)).astype(np.float32)
    pyr = dwt2(img, 3)
    spec = QuantSpec(base_step=base_step)
    rec = np.asarray(idwt2(dequantize_pyramid(quantize_pyramid(pyr, spec), spec)))
    p = float(psnr(rec, img))
    assert p > 25.0  # sane reconstruction even at coarse steps


def test_psnr_monotonic_in_step():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(1, 128, 128)).astype(np.float32)
    pyr = dwt2(img, 3)
    ps = []
    for step in [0.25, 1.0, 4.0]:
        spec = QuantSpec(base_step=step)
        rec = np.asarray(idwt2(dequantize_pyramid(quantize_pyramid(pyr, spec), spec)))
        ps.append(float(psnr(rec, img)))
    assert ps[0] >= ps[1] >= ps[2]


def test_psnr_identical_is_inf():
    a = np.ones((8, 8), np.float32)
    assert np.isinf(float(psnr(a, a)))


def test_ssim_properties():
    from wicca_tpu.core.metrics import ssim

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (64, 64)).astype(np.float32)
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    noisy = a + rng.normal(0, 10, a.shape).astype(np.float32)
    very_noisy = a + rng.normal(0, 60, a.shape).astype(np.float32)
    s1, s2 = float(ssim(a, noisy)), float(ssim(a, very_noisy))
    assert 0.0 < s2 < s1 < 1.0


class TestReconOffset:
    """Adaptive deadzone reconstruction (decoder-side Laplacian centroid)."""

    def test_scalability_paths_accept_offset(self):
        import numpy as np

        from wicca_tpu.codec.pipeline import decode, decode_at_level, decode_region, encode
        from wicca_tpu.core.quant import QuantSpec

        img = np.random.default_rng(1).integers(0, 256, (1, 128, 192), np.uint8)
        for wavelet in ("haar", "bior4.4"):
            s = encode(img, levels=4, spec=QuantSpec(base_step=4.0), wavelet=wavelet)
            full = np.asarray(decode(s, recon_offset=0.4))
            roi = np.asarray(decode_region(s, 16, 80, 32, 160, recon_offset=0.4))
            np.testing.assert_array_equal(roi, full[..., 16:80, 32:160], err_msg=wavelet)
            half = np.asarray(decode_at_level(s, 1, recon_offset=0.4))
            assert half.shape == (1, 64, 96)
