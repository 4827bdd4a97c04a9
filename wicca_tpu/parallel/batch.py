"""Data-parallel batched codec over a device mesh (BASELINE config 3:
"Batch of 30 images sharded across chips, depth 1-6 sweep with quantized
coefficients"; SURVEY.md §2.2 DP row).

Same-sized images stack into ``(N, C, H, W)`` and shard over the ``data``
axis; every op in the codec is per-image, so XLA runs the batch fully in
parallel with no collectives until the psum'd summary stats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wicca_tpu.codec.pipeline import decode, encode
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated


def _pad_batch(images: jax.Array, mesh) -> tuple[jax.Array, int]:
    """Pad N up to a multiple of the data-axis size (repeat last image);
    callers crop outputs back to N."""
    n = images.shape[0]
    ndev = mesh.shape[DATA_AXIS]
    extra = -n % ndev
    if extra:
        images = jnp.concatenate([images, jnp.repeat(images[-1:], extra, axis=0)], axis=0)
    return images, n


def dp_encode_decode_psnr(
    images: jax.Array,
    levels: int,
    spec: QuantSpec = QuantSpec(),
    *,
    mesh,
) -> jax.Array:
    """Batch (N, C, H, W) uint8 -> per-image PSNR of the quantized roundtrip,
    batch sharded over the mesh's data axis."""
    images, n = _pad_batch(jnp.asarray(images), mesh)
    images = jax.device_put(images, batch_sharding(mesh, images.ndim))

    @functools.partial(jax.jit, out_shardings=replicated(mesh))
    def run(x):
        rec = decode(encode(x, levels=levels, spec=spec))
        d = rec - x.astype(jnp.float32)
        per_mse = jnp.mean(d * d, axis=tuple(range(1, x.ndim)))
        return 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(per_mse, 1e-30))

    return run(images)[:n]


def dp_icons(images: jax.Array, depth: int, *, mesh) -> jax.Array:
    """Batch (N, C, H, W) uint8 -> (N, C, H/2^d, W/2^d) uint8 icons, batch
    sharded; bit-exact per image vs the single-image path."""
    from wicca_tpu.core.haar import haar_icon
    from wicca_tpu.ops.dwt_pallas import icon_pallas

    images, n = _pad_batch(jnp.asarray(images), mesh)
    images = jax.device_put(images, batch_sharding(mesh, images.ndim))
    fn = icon_pallas if jax.default_backend() == "tpu" else haar_icon

    @jax.jit
    def run(x):
        return fn(x, depth)

    return run(images)[:n]


def depth_sweep_psnr(images: jax.Array, depths, spec: QuantSpec = QuantSpec(), *, mesh):
    """Per-depth mean PSNR table for a sharded batch (config-3 sweep)."""
    out = {}
    for d in depths:
        out[d] = float(jnp.mean(dp_encode_decode_psnr(images, d, spec, mesh=mesh)))
    return out
