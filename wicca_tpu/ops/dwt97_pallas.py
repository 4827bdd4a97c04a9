"""Pallas TPU kernels for the CDF 9/7 (bior4.4) transform + quantization.

The JPEG2000 irreversible filter (:func:`wicca_tpu.core.lifting.cdf97_fwd1d`)
as fused multi-level TPU kernels: up to 3 float lifting levels per HBM pass
with deadzone quantization of the detail bands fused in (int16 codes — 9/7
detail gain K~1.23 puts magnitudes past int8 at fine steps), and the fused
dequantize + inverse.

Tile semantics match :mod:`wicca_tpu.ops.dwt53_pallas`: JPEG2000-style
independent (512, 1024) tiles, edge-clamped lifting at tile boundaries,
identical deterministic tile grid for encode and decode. Images within one
tile match the core XLA lifting path to float roundoff.

Neighbor access uses pltpu.roll + iota clamp exactly as in the 5/3 kernel;
all arithmetic float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wicca_tpu.core.lifting import _A97, _B97, _D97, _G97, _K97
from wicca_tpu.ops.dwt_pallas import (
    _TILE_H,
    _TILE_W,
    _band_steps3,
    _interpret,
    _pad_dim_to,
    _quant_band,
    _row_interleave,
    _tiling,
)


def _next(x, ri, hh):
    """x[n+1] along rows with edge clamp (tile-local)."""
    if hh == 1:
        return x
    n = pltpu.roll(x, hh - 1, axis=0)
    return jnp.where(ri == hh - 1, x, n)


def _prev(x, ri, hh):
    """x[n-1] along rows with edge clamp."""
    if hh == 1:
        return x
    p = pltpu.roll(x, 1, axis=0)
    return jnp.where(ri == 0, x, p)


def _lift97_rows(x):
    """Forward 9/7 lifting over row pairs (axis 0): (h, w) -> (s, d) each
    (h/2, w), matching core cdf97_fwd1d (image normalization: s has DC
    gain 1)."""
    h, w = x.shape
    hh = h // 2
    r = x.reshape(hh, 2, w)
    e, o = r[:, 0, :], r[:, 1, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    d = o + jnp.float32(_A97) * (e + _next(e, ri, hh))
    s = e + jnp.float32(_B97) * (_prev(d, ri, hh) + d)
    d = d + jnp.float32(_G97) * (s + _next(s, ri, hh))
    s = s + jnp.float32(_D97) * (_prev(d, ri, hh) + d)
    return s * jnp.float32(1.0 / _K97), d * jnp.float32(_K97)


def _unlift97_rows(s, d):
    hh, w = s.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    s = s * jnp.float32(_K97)
    d = d * jnp.float32(1.0 / _K97)
    s = s - jnp.float32(_D97) * (_prev(d, ri, hh) + d)
    d = d - jnp.float32(_G97) * (s + _next(s, ri, hh))
    s = s - jnp.float32(_B97) * (_prev(d, ri, hh) + d)
    o = d - jnp.float32(_A97) * (s + _next(s, ri, hh))
    return _row_interleave(s, o)


def _lift_db2_rows(x):
    """Forward db2 (D4) lifting over row pairs — the Daubechies-Sweldens
    factorization used by core db2_fwd1d, DC-gain-1 normalization."""
    import math

    sq3 = math.sqrt(3.0)
    h, w = x.shape
    hh = h // 2
    r = x.reshape(hh, 2, w)
    e, o = r[:, 0, :], r[:, 1, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    s1 = e + jnp.float32(sq3) * o
    d1 = o - jnp.float32(sq3 / 4.0) * s1 - jnp.float32((sq3 - 2.0) / 4.0) * _prev(s1, ri, hh)
    s2 = s1 - _next(d1, ri, hh)
    from wicca_tpu.core.lifting import _D4_SCALE_D, _D4_SCALE_S

    return s2 * jnp.float32(_D4_SCALE_S), d1 * jnp.float32(_D4_SCALE_D)


def _unlift_db2_rows(s, d):
    import math

    sq3 = math.sqrt(3.0)
    from wicca_tpu.core.lifting import _D4_SCALE_D, _D4_SCALE_S

    hh, w = s.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    s2 = s * jnp.float32(1.0 / _D4_SCALE_S)
    d1 = d * jnp.float32(1.0 / _D4_SCALE_D)
    s1 = s2 + _next(d1, ri, hh)
    o = d1 + jnp.float32(sq3 / 4.0) * s1 + jnp.float32((sq3 - 2.0) / 4.0) * _prev(s1, ri, hh)
    e = s1 - jnp.float32(sq3) * o
    return _row_interleave(e, o)


_ROW_LIFTS = {"cdf97": (_lift97_rows, _unlift97_rows), "db2": (_lift_db2_rows, _unlift_db2_rows)}


def _level97_fwd(x, filt: str = "cdf97"):
    """One 2-D lifting level, horizontal then vertical (core-path order)."""
    lift = _ROW_LIFTS[filt][0]
    s_t, d_t = lift(x.T)
    ll, hl = lift(s_t.T)
    lh, hh = lift(d_t.T)
    return ll, lh, hl, hh


def _level97_inv(ll, lh, hl, hh, filt: str = "cdf97"):
    unlift = _ROW_LIFTS[filt][1]
    lo = unlift(ll, hl)
    hi = unlift(lh, hh)
    return unlift(lo.T, hi.T).T


def _dwt97_kernel(x_ref, *out_refs, k: int, steps, from_u8: bool, filt: str):
    ll_ref = out_refs[-1]
    if from_u8:
        x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # u8->f32 ladder
    else:
        x = x_ref[0]
    for lvl in range(1, k + 1):
        x, lh, hl, hh = _level97_fwd(x, filt)
        base = (lvl - 1) * 3
        for slot, band in ((0, lh), (1, hl), (2, hh)):
            out_refs[base + slot][0] = _quant_band(
                band, steps[lvl - 1][slot], 32767, out_refs[base + slot].dtype
            )
    ll_ref[0] = x


@functools.partial(jax.jit, static_argnames=("steps", "filt"))
def dwt97_multilevel_quant_pallas(x: jax.Array, steps: tuple, filt: str = "cdf97"):
    """Up to 3 fused tile-local lifting levels (``filt``: 'cdf97' or 'db2')
    + deadzone quantization in one HBM pass. ``x``: planar ``(..., H, W)``
    uint8 or float32, dims divisible by ``2**len(steps)``.
    Returns ``(ll_f32, [(lh, hl, hh) int16, ...])``."""
    k = len(steps)
    if not 1 <= k <= 3:
        raise ValueError("1..3 levels per pass")
    steps = _band_steps3(steps)
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    unit = 1 << k
    if h % unit or w % unit:
        raise ValueError(f"H, W must be divisible by {unit}")
    from_u8 = x.dtype == jnp.uint8
    x = x.reshape((-1, h, w))
    if not from_u8:
        x = x.astype(jnp.float32)
    x, th, tw = _tiling(x)
    c, hp, wp = x.shape

    out_shapes, out_specs = [], []
    for lvl in range(1, k + 1):
        u = 1 << lvl
        for _ in range(3):
            out_shapes.append(jax.ShapeDtypeStruct((c, hp // u, wp // u), jnp.int16))
            out_specs.append(
                pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            )
    out_shapes.append(jax.ShapeDtypeStruct((c, hp // unit, wp // unit), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_dwt97_kernel, k=k, steps=steps, from_u8=from_u8, filt=filt),
        out_shape=tuple(out_shapes),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)
    details = [tuple(o.reshape(lead + o.shape[-2:]) for o in outs[i * 3 : i * 3 + 3]) for i in range(k)]
    ll = outs[-1].reshape(lead + outs[-1].shape[-2:])
    return ll, details


def _idwt97_kernel(*refs, k: int, steps, emit_u8: bool, filt: str, recon_offset: float = 0.5):
    out_ref = refs[-1]
    x = refs[0][0].astype(jnp.float32)
    for idx in range(k):
        lvl = k - idx
        base = 1 + idx * 3

        def deq(r, slot):
            qv = r[0].astype(jnp.float32)
            return (qv + jnp.float32(recon_offset) * jnp.sign(qv)) * jnp.float32(steps[lvl - 1][slot])

        x = _level97_inv(x, deq(refs[base], 0), deq(refs[base + 1], 1), deq(refs[base + 2], 2), filt)
    if emit_u8:
        out_ref[0] = jnp.clip(x, 0, 255).astype(jnp.int32).astype(jnp.uint8)
    else:
        out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("steps", "emit_u8", "orig_k", "filt", "recon_offset"))
def idwt97_multilevel_dequant_pallas(ll: jax.Array, details, steps: tuple, emit_u8: bool = False, orig_k: int | None = None, filt: str = "cdf97", recon_offset: float = 0.5):
    """Fused dequantize + inverse of :func:`dwt97_multilevel_quant_pallas`
    (one HBM pass). ``orig_k`` aligns a PARTIAL pass's tile clamps with the
    encoder grid (see the 5/3 kernel docs)."""
    k = len(steps)
    if not 1 <= k <= 3 or len(details) != k:
        raise ValueError("1..3 levels per pass; details must match steps")
    steps = _band_steps3(steps)
    if orig_k is None:
        orig_k = k
    if orig_k < k:
        raise ValueError("orig_k must be >= k")
    lead = ll.shape[:-2]
    ch, cw = ll.shape[-2], ll.shape[-1]
    unit = 1 << k
    ll3 = ll.reshape((-1, ch, cw)).astype(jnp.float32)
    c = ll3.shape[0]
    th_c = min(ch, _TILE_H >> orig_k)
    tw_c = min(cw, _TILE_W >> orig_k)
    if ch > th_c:
        ll3 = _pad_dim_to(ll3, -2, th_c)
    if cw > tw_c:
        ll3 = _pad_dim_to(ll3, -1, tw_c)
    chp, cwp = ll3.shape[-2], ll3.shape[-1]

    in_arrays = [ll3]
    in_specs = [pl.BlockSpec((1, th_c, tw_c), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)]
    for idx in range(k):
        lvl = k - idx
        m = 1 << (k - lvl)
        for band in details[lvl - 1]:
            b = band.reshape((-1, band.shape[-2], band.shape[-1]))
            want_h, want_w = chp * m, cwp * m
            if b.shape[-2] < want_h:
                b = _pad_dim_to(b, -2, want_h)
            if b.shape[-1] < want_w:
                b = _pad_dim_to(b, -1, want_w)
            b = b[:, :want_h, :want_w]
            in_arrays.append(b)
            in_specs.append(
                pl.BlockSpec((1, th_c * m, tw_c * m), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            )
    out_dt = jnp.uint8 if emit_u8 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_idwt97_kernel, k=k, steps=steps, emit_u8=emit_u8, filt=filt, recon_offset=recon_offset),
        out_shape=jax.ShapeDtypeStruct((c, chp * unit, cwp * unit), out_dt),
        grid=(c, chp // th_c, cwp // tw_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th_c * unit, tw_c * unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*in_arrays)
    return out.reshape(lead + out.shape[-2:])
