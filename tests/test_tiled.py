"""Tiled multi-device transforms on an 8-virtual-CPU-device mesh vs the
single-device core (SURVEY.md §4 'Multi-host without a cluster')."""

import numpy as np
import pytest

from tests.oracle import oracle_icon
from wicca_tpu.core.haar import dwt2, idwt2
from wicca_tpu.core.lifting import dwt2_lifting, idwt2_lifting
from wicca_tpu.parallel.mesh import make_mesh
from wicca_tpu.parallel.tiled import tiled_dwt2, tiled_icon, tiled_idwt2


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.fixture(scope="module")
def meshes():
    import jax

    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return {
        "1x8": make_mesh(ty=1, tx=8),
        "2x4": make_mesh(ty=2, tx=4),
        "4x2": make_mesh(ty=4, tx=2),
        "2x2": make_mesh(data=2, ty=2, tx=2),
    }


@pytest.mark.parametrize("mesh_key,depth", [("1x8", 1), ("2x4", 3), ("4x2", 5), ("2x2", 3)])
def test_tiled_icon_bit_exact(meshes, mesh_key, depth):
    mesh = meshes[mesh_key]
    img = _rand_img((3, 256, 384), seed=depth)
    want = oracle_icon(np.moveaxis(img, 0, -1), depth)
    got = np.asarray(tiled_icon(img, depth, mesh=mesh))
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want)


def test_tiled_icon_unaligned_dims(meshes):
    # dims not divisible by tiles*2^d: alignment padding is cropped away and
    # Haar tile-locality keeps every kept pixel bit-exact
    img = _rand_img((3, 250, 370), seed=9)
    want = oracle_icon(np.moveaxis(img, 0, -1), 3)
    got = np.asarray(tiled_icon(img, 3, mesh=meshes["2x4"]))
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), want)


@pytest.mark.parametrize("wavelet", ["haar", "haar_int"])
def test_tiled_haar_matches_core_bit_exact(meshes, wavelet):
    mesh = meshes["2x4"]
    img = _rand_img((3, 128, 256), seed=4)
    levels = 3
    tp = tiled_dwt2(img, levels, wavelet, mesh=mesh)
    cp = dwt2(img.astype(np.float32), levels) if wavelet == "haar" else dwt2_lifting(img, levels, wavelet)
    np.testing.assert_array_equal(np.asarray(tp.ll), np.asarray(cp.ll))
    for (a, b, c), (x, y, z) in zip(tp.details, cp.details):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(z))
    rec = np.asarray(tiled_idwt2(tp, mesh=mesh))
    np.testing.assert_array_equal(rec, img.astype(rec.dtype))


@pytest.mark.parametrize(
    "wavelet,mesh_key",
    [
        ("db2", "2x4"),
        pytest.param("bior4.4", "1x8", marks=pytest.mark.slow),
        pytest.param("bior4.4", "4x2", marks=pytest.mark.slow),
    ],
)
def test_tiled_wide_wavelets_halo_exchange(meshes, wavelet, mesh_key):
    # aligned dims: tiled must match single-device to float tolerance, which
    # exercises the per-step ppermute halos across interior boundaries
    mesh = meshes[mesh_key]
    img = _rand_img((1, 128, 128), seed=6).astype(np.float32)
    levels = 2
    tp = tiled_dwt2(img, levels, wavelet, mesh=mesh)
    cp = dwt2_lifting(img, levels, wavelet)
    np.testing.assert_allclose(np.asarray(tp.ll), np.asarray(cp.ll), atol=1e-3, rtol=1e-5)
    for (a, _, _), (x, _, _) in zip(tp.details, cp.details):
        np.testing.assert_allclose(np.asarray(a), np.asarray(x), atol=1e-3, rtol=1e-5)
    rec = np.asarray(tiled_idwt2(tp, mesh=mesh))
    np.testing.assert_allclose(rec, img, atol=5e-3)


@pytest.mark.slow
def test_tiled_roundtrip_odd_shape_wide(meshes):
    # unaligned dims + wide wavelet: coefficients may shift at the very edge
    # but the tiled roundtrip itself must still reconstruct the input
    mesh = meshes["2x4"]
    img = _rand_img((1, 100, 172), seed=8).astype(np.float32)
    tp = tiled_dwt2(img, 2, "bior4.4", mesh=mesh)
    rec = np.asarray(tiled_idwt2(tp, mesh=mesh))
    assert rec.shape == img.shape
    np.testing.assert_allclose(rec, img, atol=5e-3)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(data=4, ty=4, tx=4)


def test_tiled_stats_psum(meshes):
    from wicca_tpu.parallel.tiled import tiled_stats

    img = _rand_img((1, 64, 128), seed=11)
    stats = tiled_stats(img, mesh=meshes["2x4"])
    assert abs(stats["mean"] - img.mean()) < 1e-3
    assert abs(stats["std"] - img.std()) < 1e-2
    assert stats["min"] == img.min() and stats["max"] == img.max()


def test_tiled_legall53_halo_bit_exact(meshes):
    # integer wavelet WITH halos: per-step ppermute exchange in int32 must
    # reproduce the single-device transform exactly (no float tolerance)
    mesh = meshes["2x4"]
    img = _rand_img((1, 128, 256), seed=12)
    levels = 3
    tp = tiled_dwt2(img, levels, "legall5.3", mesh=mesh)
    cp = dwt2_lifting(img, levels, "legall5.3")
    np.testing.assert_array_equal(np.asarray(tp.ll), np.asarray(cp.ll))
    for (a, b, c), (x, y, z) in zip(tp.details, cp.details):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(z))
    rec = np.asarray(tiled_idwt2(tp, mesh=mesh))
    np.testing.assert_array_equal(rec, img.astype(rec.dtype))
