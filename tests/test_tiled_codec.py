"""Mesh-sharded codec (parallel.codec): streams must interoperate with the
single-device pipeline and the .wct container (BASELINE config 5 end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wicca_tpu.codec import decode, deserialize, encode, serialize
from wicca_tpu.core.metrics import psnr
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.parallel import make_mesh, tiled_decode, tiled_encode


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=1, ty=2, tx=4)


def _img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _put(x, mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(*([None] * (x.ndim - 2)), "ty", "tx")))


def test_tiled_encode_haar_int_matches_single_device(mesh):
    x = _img((3, 64, 128), 0)
    st_t = tiled_encode(_put(x, mesh), levels=2, wavelet="haar_int", mesh=mesh)
    st_s = encode(x, levels=2, wavelet="haar_int")
    # pair-local transform: coefficients bit-identical at any mesh shape
    np.testing.assert_array_equal(np.asarray(st_t.ll), np.asarray(st_s.ll))
    for a, b in zip(st_t.details, st_s.details):
        for p, q in zip(a, b):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
    # single-device decode of the mesh-encoded stream is lossless
    np.testing.assert_array_equal(np.asarray(decode(st_t, emit_u8=True)), x)
    # and the sharded decode matches
    np.testing.assert_array_equal(np.asarray(tiled_decode(st_t, mesh=mesh, emit_u8=True)), x)


def test_tiled_encode_haar_lossy_cross_decode(mesh):
    x = _img((1, 64, 128), 1)
    spec = QuantSpec(base_step=1.0)  # power-of-two step => exact dyadic floats
    st_t = tiled_encode(_put(x, mesh), levels=2, spec=spec, wavelet="haar", mesh=mesh)
    st_s = encode(x, levels=2, spec=spec)
    np.testing.assert_array_equal(np.asarray(decode(st_t)), np.asarray(decode(st_s)))
    np.testing.assert_array_equal(
        np.asarray(tiled_decode(st_s, mesh=mesh)), np.asarray(decode(st_s))
    )


@pytest.mark.slow  # ~90s (per-lifting-step halo compile); the dryrun's
# bior4.4 mesh step covers the same path in the default gate
def test_tiled_encode_wide_wavelet_global_layout(mesh):
    x = _img((1, 64, 128), 2)
    spec = QuantSpec(base_step=1.0)
    st = tiled_encode(_put(x, mesh), levels=2, spec=spec, wavelet="bior4.4", mesh=mesh)
    assert st.layout == "global"
    rec_mesh = np.asarray(tiled_decode(st, mesh=mesh))
    rec_single = np.asarray(decode(st))  # core.lifting global inverse
    assert np.abs(rec_mesh - rec_single).max() < 1e-2  # XLA fusion ulps only
    p = float(psnr(jnp.asarray(rec_mesh), jnp.asarray(x.astype(np.float32))))
    assert p > 38.0, p


def test_tiled_stream_serializes_with_quality_layers(mesh):
    x = _img((3, 64, 128), 3)
    st = tiled_encode(_put(x, mesh), levels=2, wavelet="legall5.3", color="rct", mesh=mesh)
    blob = serialize(st, quality_layers=3)
    back = deserialize(blob)
    np.testing.assert_array_equal(np.asarray(decode(back, emit_u8=True)), x)
    preview = deserialize(blob, max_layers=1)
    rec = np.asarray(decode(preview, emit_u8=True))
    assert rec.shape == x.shape


def test_tiled_haar_stream_bit_identical_with_tile_padding(mesh):
    """Lossy haar STREAMS (not just decodes) are bit-identical between the
    mesh and single-device encoders, including sizes where the fused kernels
    tile-pad internally (VERDICT r2 item 3: semantic-cropped storage makes
    streams mesh-shape-independent)."""
    x = _img((1, 1088, 256), 5)  # 1088 > _TILE_H=512 and not a 512 multiple
    spec = QuantSpec(base_step=1.0)
    st_t = tiled_encode(_put(x, mesh), levels=2, spec=spec, wavelet="haar", mesh=mesh)
    st_s = encode(x, levels=2, spec=spec)
    assert st_t.ll.shape == st_s.ll.shape == (1, 272, 64)  # semantic, not padded
    np.testing.assert_array_equal(np.asarray(st_t.ll), np.asarray(st_s.ll))
    for a, b in zip(st_t.details, st_s.details):
        for p, q in zip(a, b):
            assert p.shape == q.shape
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
    np.testing.assert_array_equal(
        np.asarray(tiled_decode(st_t, mesh=mesh, emit_u8=True)),
        np.asarray(decode(st_s, emit_u8=True)),
    )


def test_tiled_53_aligned_runs_fused_and_matches_single_device(mesh):
    """When the image aligns the shard grid with the J2K tile grid, legall5.3
    runs the fused per-shard Pallas kernels (layout='tiled') and the stream is
    bit-identical to the single-device encoder."""
    from wicca_tpu.parallel.codec import mesh53_aligned

    assert mesh53_aligned(1024, 4096, 2, 4, 2)
    assert not mesh53_aligned(1024, 4096, 2, 4, 5)  # pass 2 input too small
    x = _img((1, 1024, 4096), 6)
    st_t = tiled_encode(_put(x, mesh), levels=2, wavelet="legall5.3", mesh=mesh)
    assert st_t.layout == "tiled"
    st_s = encode(x, levels=2, wavelet="legall5.3")
    np.testing.assert_array_equal(np.asarray(st_t.ll), np.asarray(st_s.ll))
    for a, b in zip(st_t.details, st_s.details):
        for p, q in zip(a, b):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
    np.testing.assert_array_equal(np.asarray(tiled_decode(st_t, mesh=mesh, emit_u8=True)), x)


def test_tiled_encode_uses_pallas_kernels(mesh):
    """The mesh path must lower through pallas_call (VERDICT r2 item 3:
    'Pallas path confirmed in the jaxpr')."""
    x = _put(_img((1, 64, 128), 7), mesh)
    jaxpr = jax.make_jaxpr(
        lambda im: tiled_encode(im, levels=2, spec=QuantSpec(base_step=1.0), wavelet="haar", mesh=mesh).ll
    )(x)
    assert "pallas_call" in str(jaxpr)


def test_tiled_53_tiled_layout_stream_falls_back_single_decode(mesh):
    """A tile-local 5/3 stream whose grid can't map onto the mesh decodes
    exactly (single-device fallback) instead of wrong in parallel."""
    x = _img((1, 96, 160), 8)
    st = encode(x, levels=2, wavelet="legall5.3")  # tiled layout, unaligned
    np.testing.assert_array_equal(np.asarray(tiled_decode(st, mesh=mesh, emit_u8=True)), x)


def test_tiled_encode_rejects_bad_color(mesh):
    x = _put(_img((3, 32, 32), 4), mesh)
    with pytest.raises(ValueError):
        tiled_encode(x, levels=1, wavelet="haar", color="rct", mesh=mesh)
    with pytest.raises(ValueError):
        tiled_encode(x, levels=1, wavelet="haar_int", color="ict", mesh=mesh)
