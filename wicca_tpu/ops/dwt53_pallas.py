"""Pallas TPU kernels for the LeGall 5/3 reversible (lossless) transform.

The JPEG2000 reversible filter (:func:`wicca_tpu.core.lifting.legall53_fwd1d`)
as fused multi-level TPU kernels: up to 3 integer lifting levels per HBM
pass, int16 detail emission, exactly invertible.

Tile semantics — JPEG2000-style independent tiles: levels are computed
TILE-LOCALLY on (512, 1024) VMEM tiles with edge-clamped lifting at tile
boundaries (exactly how J2K codes independent tiles). Encode and decode use
the same deterministic tile grid, so the roundtrip is bit-exact everywhere;
coefficients near interior tile edges differ from the whole-image transform
(:mod:`wicca_tpu.core.lifting`), which costs nothing in a lossless stream
(no quantization => no quality impact; compression ratio shifts are in the
noise). Images that fit one tile produce bit-identical coefficients to the
core path (the kernel applies the same horizontal-then-vertical order).

Mosaic notes (probed on this v5e): neighbor access inside a tile uses
``pltpu.roll`` + iota-clamp at the tile edge (strided slices are rejected;
positive shifts only); pair split via ``reshape(h//2, 2, w)`` + middle
index; int arithmetic in int32 (int16 vector subtract crashes this Mosaic);
detail stores cast i32 -> i16 at the output ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wicca_tpu.ops.dwt_pallas import (
    _TILE_H,
    _TILE_W,
    _interpret,
    _pad_dim_to,
    _row_interleave,
    _tiling,
)


def _lift53_rows(x):
    """Forward 5/3 lifting over row pairs (axis 0): returns (s, d), each
    (h//2, w). Edge handling = index clamp, matching core legall53_fwd1d."""
    h, w = x.shape
    hh = h // 2
    r = x.reshape(hh, 2, w)
    e, o = r[:, 0, :], r[:, 1, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    if hh > 1:
        en = pltpu.roll(e, hh - 1, axis=0)  # e[n+1] (cyclic)
        en = jnp.where(ri == hh - 1, e, en)  # clamp at the edge
    else:
        en = e
    d = o - ((e + en) >> 1)
    if hh > 1:
        dp = pltpu.roll(d, 1, axis=0)  # d[n-1] (cyclic)
        dp = jnp.where(ri == 0, d, dp)
    else:
        dp = d
    s = e + ((dp + d + 2) >> 2)
    return s, d


def _unlift53_rows(s, d):
    """Inverse of :func:`_lift53_rows`: (s, d) -> interleaved (h, w)."""
    hh, w = s.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0)
    if hh > 1:
        dp = pltpu.roll(d, 1, axis=0)
        dp = jnp.where(ri == 0, d, dp)
    else:
        dp = d
    e = s - ((dp + d + 2) >> 2)
    if hh > 1:
        en = pltpu.roll(e, hh - 1, axis=0)
        en = jnp.where(ri == hh - 1, e, en)
    else:
        en = e
    o = d + ((e + en) >> 1)
    return _row_interleave(e, o)


def _lift_s_rows(x):
    """Forward integer-Haar S-transform over row pairs: d = o - e,
    s = e + (d >> 1) (core haar_int_fwd1d). Pair-local — no neighbor taps —
    so the tile-local kernel is BIT-IDENTICAL to the whole-image transform."""
    h, w = x.shape
    r = x.reshape(h // 2, 2, w)
    e, o = r[:, 0, :], r[:, 1, :]
    d = o - e
    s = e + (d >> 1)
    return s, d


def _unlift_s_rows(s, d):
    e = s - (d >> 1)
    o = d + e
    return _row_interleave(e, o)


_LIFT_ROWS = {
    "legall5.3": (_lift53_rows, _unlift53_rows),
    "haar_int": (_lift_s_rows, _unlift_s_rows),
}


def _level53_fwd(x, filt: str = "legall5.3"):
    """One 2-D reversible level, horizontal then vertical (core-path order).
    x: (h, w) int32 -> (ll, lh, hl, hh) each (h/2, w/2) int32."""
    lift, _ = _LIFT_ROWS[filt]
    s_t, d_t = lift(x.T)  # horizontal lifting on the transpose
    ll, hl = lift(s_t.T)  # vertical lifting of horizontal-low
    lh, hh = lift(d_t.T)
    return ll, lh, hl, hh


def _level53_inv(ll, lh, hl, hh, filt: str = "legall5.3"):
    _, unlift = _LIFT_ROWS[filt]
    lo = unlift(ll, hl)  # vertical inverse
    hi = unlift(lh, hh)
    x_t = unlift(lo.T, hi.T)  # horizontal inverse on transposes
    return x_t.T


def _dwt53_kernel(x_ref, *out_refs, k: int, from_u8: bool, filt: str):
    """k fused levels. Outputs: [lh1, hl1, hh1, ..., lhk, hlk, hhk, ll]."""
    ll_ref = out_refs[-1]
    x = x_ref[0].astype(jnp.int32) if from_u8 else x_ref[0]
    for lvl in range(1, k + 1):
        x, lh, hl, hh = _level53_fwd(x, filt)
        base = (lvl - 1) * 3
        for slot, band in ((0, lh), (1, hl), (2, hh)):
            out_refs[base + slot][0] = band.astype(out_refs[base + slot].dtype)
    ll_ref[0] = x


@functools.partial(jax.jit, static_argnames=("k", "filt"))
def dwt53_multilevel_pallas(x: jax.Array, k: int, filt: str = "legall5.3"):
    """Up to 3 fused tile-local reversible levels in one HBM pass.

    ``x``: planar ``(..., H, W)`` uint8 or int32; H, W divisible by ``2**k``
    (pad first). Returns ``(ll_i32, [(lh, hl, hh) int16, ...])`` fine-to-
    coarse. Large dims are replicate-padded to tile multiples (crop via the
    codec shape chain, as with the Haar kernels).

    ``filt``: 'legall5.3' (JPEG2000 reversible 5/3) or 'haar_int' (the
    S-transform; pair-local, so tiling is invisible — coefficients are
    bit-identical to :func:`wicca_tpu.core.lifting.dwt2_lifting`).
    """
    if filt not in _LIFT_ROWS:
        raise ValueError(f"filt must be one of {sorted(_LIFT_ROWS)}")
    if not 1 <= k <= 3:
        raise ValueError("1..3 levels per pass")
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    unit = 1 << k
    if h % unit or w % unit:
        raise ValueError(f"H, W must be divisible by {unit}")
    from_u8 = x.dtype == jnp.uint8
    x = x.reshape((-1, h, w))
    if not from_u8:
        x = x.astype(jnp.int32)
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
    out_shapes.append(jax.ShapeDtypeStruct((c, hp // unit, wp // unit), jnp.int32))
    out_specs.append(
        pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_dwt53_kernel, k=k, from_u8=from_u8, filt=filt),
        out_shape=tuple(out_shapes),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)
    details = [tuple(o.reshape(lead + o.shape[-2:]) for o in outs[i * 3 : i * 3 + 3]) for i in range(k)]
    ll = outs[-1].reshape(lead + outs[-1].shape[-2:])
    return ll, details


def _idwt53_kernel(*refs, k: int, emit_u8: bool, filt: str):
    """Inputs: [ll, lhk, hlk, hhk, ..., lh1, hl1, hh1]; output last."""
    out_ref = refs[-1]
    x = refs[0][0].astype(jnp.int32)
    for idx in range(k):
        base = 1 + idx * 3
        lh = refs[base][0].astype(jnp.int32)
        hl = refs[base + 1][0].astype(jnp.int32)
        hh = refs[base + 2][0].astype(jnp.int32)
        x = _level53_inv(x, lh, hl, hh, filt)
    if emit_u8:
        out_ref[0] = jnp.clip(x, 0, 255).astype(jnp.uint8)
    else:
        out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("k", "emit_u8", "orig_k", "filt"))
def idwt53_multilevel_pallas(
    ll: jax.Array, details, k: int, emit_u8: bool = False, orig_k: int | None = None, filt: str = "legall5.3"
):
    """Fused inverse of :func:`dwt53_multilevel_pallas` (one HBM pass).

    ``details``: [(lh, hl, hh), ...] fine-to-coarse, ``len(details) == k``.
    Bit-exact inverse on the same tile grid. For a PARTIAL pass (progressive
    decode inverting only the coarse ``k`` of an ``orig_k``-level pass), pass
    ``orig_k`` so the tile caps — and therefore the edge-clamp boundaries of
    the tile-local lifting — match the ones the encoder used.
    """
    if not 1 <= k <= 3 or len(details) != k:
        raise ValueError("1..3 levels per pass; details must match k")
    if orig_k is None:
        orig_k = k
    if orig_k < k:
        raise ValueError("orig_k must be >= k")
    lead = ll.shape[:-2]
    ch, cw = ll.shape[-2], ll.shape[-1]
    unit = 1 << k
    ll3 = ll.reshape((-1, ch, cw)).astype(jnp.int32)
    c = ll3.shape[0]
    # coarse tile = encoder tile cap divided by the FULL pass depth, so the
    # tile-local clamps land where the forward transform clamped
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
    out_dt = jnp.uint8 if emit_u8 else jnp.int32
    out = pl.pallas_call(
        functools.partial(_idwt53_kernel, k=k, emit_u8=emit_u8, filt=filt),
        out_shape=jax.ShapeDtypeStruct((c, chp * unit, cwp * unit), out_dt),
        grid=(c, chp // th_c, cwp // tw_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th_c * unit, tw_c * unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*in_arrays)
    return out.reshape(lead + out.shape[-2:])
