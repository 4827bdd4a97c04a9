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


def _ssim_parts(a: jnp.ndarray, b: jnp.ndarray, peak: float, window: int):
    """(mean luminance term, mean contrast-structure term) over non-
    overlapping windows of the trailing two axes — the two factors of SSIM,
    needed separately by :func:`ms_ssim`."""
    h, w = a.shape[-2], a.shape[-1]
    hh, ww = h - h % window, w - w % window
    a = a[..., :hh, :ww]
    b = b[..., :hh, :ww]
    sa = a.reshape(*a.shape[:-2], hh // window, window, ww // window, window)
    sb = b.reshape(*b.shape[:-2], hh // window, window, ww // window, window)
    axes = (-3, -1)
    mu_a = sa.mean(axis=axes)
    mu_b = sb.mean(axis=axes)
    var_a = sa.var(axis=axes)
    var_b = sb.var(axis=axes)
    cov = (sa * sb).mean(axis=axes) - mu_a * mu_b
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    lum = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    return jnp.mean(lum), jnp.mean(cs)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pool of the trailing two axes (odd tails cropped)."""
    h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
    x = x[..., :h, :w]
    return x.reshape(*x.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0, window: int = 8) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003): contrast-structure terms at up to
    5 dyadic scales (2x2 mean-pool between scales) and the luminance term at
    the coarsest, combined with the canonical exponents. Scales that would
    shrink below one window are dropped and the weights renormalized, so
    small images degrade gracefully toward single-scale SSIM.

    Same block-windowed construction as :func:`ssim` — reshapes + reductions
    only, XLA-fusable on TPU. Negative structure terms (anticorrelated
    windows) are clamped to a small positive floor before the fractional
    powers, the standard practice."""
    weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    m = min(a.shape[-2], a.shape[-1])
    n = 1
    while n < len(weights) and (m >> n) >= window:
        n += 1
    wsum = sum(weights[:n])
    exps = [wt / wsum for wt in weights[:n]]
    out = jnp.float32(1.0)
    for i, e in enumerate(exps):
        lum, cs = _ssim_parts(a, b, peak, window)
        term = lum * cs if i == n - 1 else cs
        out = out * jnp.maximum(term, 1e-6) ** e
        if i < n - 1:
            a = _downsample2(a)
            b = _downsample2(b)
    return out


def ssim(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0, window: int = 8) -> jnp.ndarray:
    """Mean structural similarity over non-overlapping windows of the
    trailing two axes (uniform window; standard K1/K2 constants).

    Block-based SSIM (rather than gaussian-sliding) keeps the computation a
    pair of reshapes + reductions — XLA-fusable on TPU — while tracking the
    canonical metric closely at window=8.
    """
    import jax.numpy as _jnp

    a = a.astype(_jnp.float32)
    b = b.astype(_jnp.float32)
    h, w = a.shape[-2], a.shape[-1]
    hh, ww = h - h % window, w - w % window
    a = a[..., :hh, :ww]
    b = b[..., :hh, :ww]
    sa = a.reshape(*a.shape[:-2], hh // window, window, ww // window, window)
    sb = b.reshape(*b.shape[:-2], hh // window, window, ww // window, window)
    axes = (-3, -1)
    mu_a = sa.mean(axis=axes)
    mu_b = sb.mean(axis=axes)
    var_a = sa.var(axis=axes)
    var_b = sb.var(axis=axes)
    cov = (sa * sb).mean(axis=axes) - mu_a * mu_b
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return _jnp.mean(s)
