"""Host icon cascade (core/icon_host.py): bit-exact vs the device contract
(tests/oracle.py + core.haar.haar_icon) at every depth, and the harness
routes to it only by the measured-bandwidth cost model."""

import numpy as np
import pytest

from tests.oracle import oracle_icon
from wicca_tpu.core.haar import haar_icon
from wicca_tpu.core.icon_host import icon_host, icons_multi


@pytest.mark.parametrize("shape", [(256, 320), (250, 318), (97, 129)])
@pytest.mark.parametrize("depth", [1, 2, 3, 5, 6])
def test_bit_exact_vs_oracle(shape, depth):
    rng = np.random.default_rng(depth)
    hwc = rng.integers(0, 256, (*shape, 3), np.uint8)
    planar = np.moveaxis(hwc, -1, 0)
    got = icon_host(planar, depth)
    want = np.moveaxis(oracle_icon(hwc, depth), -1, 0)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(haar_icon(planar, depth)))


def test_multi_depth_cascade_matches_per_depth():
    rng = np.random.default_rng(9)
    planar = rng.integers(0, 256, (3, 250, 318), np.uint8)
    multi = icons_multi(planar, (1, 3, 4, 6))
    for d, icon in multi.items():
        np.testing.assert_array_equal(icon, icon_host(planar, d))


def test_grayscale_2d():
    rng = np.random.default_rng(10)
    x = rng.integers(0, 256, (123, 200), np.uint8)
    got = icon_host(x, 3)
    want = oracle_icon(x[..., None], 3)[..., 0]
    np.testing.assert_array_equal(got, want)


def test_harness_icon_routes_by_cost_model(monkeypatch):
    """_compute_icon: host route when the measured link is slow, device
    otherwise — identical outputs either way."""
    import math

    from wicca_tpu.codec import transfer
    from wicca_tpu.harness import processor

    rng = np.random.default_rng(11)
    hwc = rng.integers(0, 256, (512, 640, 3), np.uint8)
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: math.inf)
    dev = processor._compute_icon(hwc, 4)
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: 40e6)
    host = processor._compute_icon(hwc, 4)
    np.testing.assert_array_equal(dev, host)
    assert processor._icon_route(hwc.nbytes, 0.33) == "host"
    monkeypatch.setattr(transfer, "link_bandwidth", lambda probe=False: math.inf)
    assert processor._icon_route(hwc.nbytes, 0.33) == "device"
    monkeypatch.setenv("WICCA_TPU_ICON_PATH", "host")
    assert processor._icon_route(hwc.nbytes, 0.33) == "host"
