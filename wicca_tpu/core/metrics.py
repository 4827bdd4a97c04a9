"""Image-quality metrics (PSNR/MSE) for the codec path.

The reference computes no image-quality metric (its metrics are
classification-similarity only, SURVEY.md C5); PSNR is a north-star addition
(BASELINE.json: "PSNR >= reference for quantized icon paths"). Pure jnp,
jit-safe, reduction order fixed for cross-backend determinism.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB; inf for identical inputs."""
    m = mse(a, b)
    return jnp.where(m == 0, jnp.inf, 10.0 * jnp.log10(peak * peak / jnp.maximum(m, 1e-30)))
