"""Coefficient quantization for the wavelet codec path.

The reference has no quantization at all — its single lossy step is the final
uint8 cast of the icon (/root/reference/wicca/wavelet_coder.py:67). The
north-star extends this to per-subband quantized coefficients
(BASELINE.json: "coefficient quantization", "quantized icon paths"). Design
follows JPEG2000-style uniform deadzone scalar quantization: detail subbands
are quantized with a per-level step; LL is kept at a finer step (or lossless).

All functions are elementwise jnp and fuse into the surrounding DWT under
jit; the Pallas path fuses them into the transform kernel explicitly
(:mod:`wicca_tpu.ops.dwt_pallas`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from wicca_tpu.core.haar import Pyramid


def quantize_deadzone(c: jnp.ndarray, step: float, dtype=jnp.int32) -> jnp.ndarray:
    """Uniform deadzone quantizer: q = sign(c) * floor(|c| / step).

    The doubled-width zero bin kills near-zero detail coefficients, which is
    where wavelet sparsity lives.
    """
    return (jnp.sign(c) * jnp.floor(jnp.abs(c) / step)).astype(dtype)


def dequantize_deadzone(q: jnp.ndarray, step: float, dtype=jnp.float32, offset: float = 0.5) -> jnp.ndarray:
    """Bin-offset reconstruction: c' = sign(q) * (|q| + offset) * step, 0 -> 0.

    ``offset=0.5`` is the midpoint and ships as the default: the
    Laplacian-centroid offset (1/t - 1/(e^t - 1), t from the zero-code
    fraction) was implemented and MEASURED WORSE on 1/f photo-like content
    (41.29 dB @ 0.5 vs 40.52 @ 0.30 at step 4; optimum 0.44-0.50 across
    steps 4-16, <= 0.03 dB from midpoint) — real detail bands are
    heavier-tailed than Laplacian, so the in-bin density is nearly flat.
    The knob stays (decoder-side, no bitstream change) for content where
    tuning pays; see docs/PERFORMANCE.md."""
    qf = q.astype(dtype)
    return jnp.sign(qf) * (jnp.abs(qf) + offset) * step


def quantize_midtread(c: jnp.ndarray, step: float, dtype=jnp.int32) -> jnp.ndarray:
    """Round-to-nearest uniform quantizer (used for LL, where bias matters)."""
    return jnp.round(c / step).astype(dtype)


def dequantize_midtread(q: jnp.ndarray, step: float, dtype=jnp.float32) -> jnp.ndarray:
    return q.astype(dtype) * step


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["base_step", "level_gain", "ll_step", "coeff_dtype", "hh_gain"],
)
@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Per-subband quantization policy.

    Detail subband at level l (1 = finest) uses ``base_step * level_gain**(l-1)``.
    In image normalization a unit quantization error on a level-l detail
    coefficient contributes the same per-pixel MSE at every level (the
    synthesis amplitude is 1 and support/count effects cancel), so the
    MSE-optimal allocation is a uniform step: ``level_gain = 1``.

    ``hh_gain`` is JPEG2000-style visual frequency weighting: the diagonal
    (HH) band is quantized ``hh_gain`` times coarser than LH/HL at every
    level. The human CSF is least sensitive to diagonal detail, so
    ``hh_gain ~ 1.5-2`` buys bitrate at roughly constant perceived quality
    (measure with the MS-SSIM R-D tooling); 1.0 (default) is the MSE-optimal
    uniform allocation.
    """

    base_step: float = 1.0
    level_gain: float = 1.0
    ll_step: float = 0.25
    coeff_dtype: jnp.dtype = jnp.int32
    hh_gain: float = 1.0

    def detail_step(self, level: int) -> float:
        return self.base_step * self.level_gain ** (level - 1)

    def band_steps(self, level: int) -> tuple[float, float, float]:
        """(lh, hl, hh) steps at ``level`` — the storage order of detail
        band triples throughout the codec."""
        s = self.detail_step(level)
        return (s, s, s * self.hh_gain)


def quantize_pyramid(pyr: Pyramid, spec: QuantSpec) -> Pyramid:
    """Quantize a float pyramid to integer codes (same Pyramid structure)."""
    details = tuple(
        tuple(
            quantize_deadzone(b, s, spec.coeff_dtype)
            for b, s in zip(bands, spec.band_steps(lvl + 1))
        )
        for lvl, bands in enumerate(pyr.details)
    )
    ll = quantize_midtread(pyr.ll, spec.ll_step, spec.coeff_dtype)
    return Pyramid(ll=ll, details=details, wavelet=pyr.wavelet, orig_shape=pyr.orig_shape)


def dequantize_pyramid(pyr: Pyramid, spec: QuantSpec) -> Pyramid:
    details = tuple(
        tuple(dequantize_deadzone(b, s) for b, s in zip(bands, spec.band_steps(lvl + 1)))
        for lvl, bands in enumerate(pyr.details)
    )
    ll = dequantize_midtread(pyr.ll, spec.ll_step)
    return Pyramid(ll=ll, details=details, wavelet=pyr.wavelet, orig_shape=pyr.orig_shape)
