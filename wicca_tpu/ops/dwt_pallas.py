"""Pallas TPU kernels for the hot transform loops (SURVEY.md §7 L2).

The reference's hot loop is a full-resolution numpy Haar chain re-run per
classifier per depth (/root/reference/wicca/classifying_tools.py:297-323 +
wavelet_coder.py:61-65; SURVEY.md §3.2) — pure HBM-bandwidth work. These
kernels fuse the entire multi-level chain (and quantization) into single
passes over HBM:

* :func:`icon_pallas` — multi-level LL icon, uint8 in -> uint8 out, reading
  the image exactly once (~1 byte/pixel of HBM traffic vs the jnp path's
  per-level materialization).
* :func:`dwt_level_quant_pallas` — one full-subband Haar level fused with
  deadzone quantization of the detail bands (int8 codes), float32 LL out.
* :func:`idwt_level_dequant_pallas` — the fused inverse.

Bit-exactness of the icon (SURVEY.md §2.3): levels 1-3 accumulate in int16 —
exact integer arithmetic; the reference's float32 chain is also exact there
(every intermediate is a dyadic rational below 2^24) — then the chain
continues in float32 with the reference association order (row pairs then
column pairs), so results are bit-identical.

Mosaic constraints shape the implementation (probed on TPU v5e): no strided
slices, no uint8<->float32 casts, no lane-interleave reshape. Row-pair
extraction uses ``reshape(h//2, 2, w)`` + middle index; column passes run as
row passes on the transpose (association order restored for float levels);
interleaves run as row-interleaves in transposed space.

Tiling: row stripes of the full padded width, stripe height a multiple of
2**depth — Haar support is 2, so stripes never need halos. Wrappers pad with
the requested border mode and crop outputs; Haar locality keeps kept
coefficients unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wicca_tpu.core.pad import pad_to_multiple

# Target VMEM bytes for the input-side stripe buffer.
_STRIPE_BYTES = 2 * 1024 * 1024


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU so CI (CPU) exercises them."""
    return jax.default_backend() != "tpu"


def _stripe_height(h: int, depth: int, w: int, itemsize: int) -> int:
    """Stripe height: multiple of 2**depth dividing h, sized to VMEM."""
    unit = 1 << depth
    assert h % unit == 0
    th = unit
    while th * 2 <= h and h % (th * 2) == 0 and th * 2 * w * itemsize <= _STRIPE_BYTES:
        th *= 2
    return th


# In-kernel transposes of very wide blocks blow up Mosaic compile time; cap
# tile extents so transposed intermediates stay modest.
_MAX_TILE = 1024


def _tile_extent(n: int, depth: int, cap: int = _MAX_TILE) -> int:
    """Largest power-of-two multiple of 2**depth that divides n, <= cap."""
    unit = 1 << depth
    assert n % unit == 0
    t = unit
    while t * 2 <= n and n % (t * 2) == 0 and t * 2 <= cap:
        t *= 2
    return t


def _rowpair(x):
    """x[0::2] + x[1::2] without strided slices (Mosaic-safe)."""
    h, w = x.shape
    r = x.reshape(h // 2, 2, w)
    return r[:, 0, :] + r[:, 1, :]


def _rowpair_sumdiff(x):
    h, w = x.shape
    r = x.reshape(h // 2, 2, w)
    return r[:, 0, :] + r[:, 1, :], r[:, 0, :] - r[:, 1, :]


def _row_interleave(a, b):
    """Rows a0,b0,a1,b1,... (supported stack+reshape pattern)."""
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(h * 2, w)


def _lane_interleave(a, b):
    """Lanes a0,b0,a1,b1,... via transposed row-interleave (the direct
    lane-interleave reshape is rejected by Mosaic)."""
    return _row_interleave(a.T, b.T).T


def _icon_kernel(x_ref, out_ref, *, depth: int):
    x = x_ref[0].astype(jnp.int16)
    int_levels = min(depth, 3)  # partial sums <= 255 * 4**3 fit int16
    transposed = False
    for _ in range(int_levels):
        # integer adds are associative: orientation does not matter here
        x = _rowpair(x)
        x = _rowpair(x.T)
        transposed = not transposed
    acc = x.astype(jnp.float32) * jnp.float32(0.25**int_levels)
    if transposed and depth > int_levels:
        acc = acc.T
        transposed = False
    for _ in range(depth - int_levels):
        # float levels must keep the reference association: rows then columns
        rs = _rowpair(acc)
        acc = _rowpair(rs.T).T * jnp.float32(0.25)
    if transposed:
        acc = acc.T
    out_ref[0] = jnp.clip(acc, 0, 255).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("depth", "mode", "constant"))
def icon_pallas(image: jax.Array, depth: int, mode: str = "replicate", constant: int = 0) -> jax.Array:
    """Reference-parity uint8 icon via a single fused Pallas pass.

    ``image``: planar ``(..., H, W)`` uint8. Returns ``(..., ceil(H/2^d),
    ceil(W/2^d))`` uint8, bit-exact vs :func:`wicca_tpu.core.haar.haar_icon`.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    lead = image.shape[:-2]
    h, w = image.shape[-2], image.shape[-1]
    unit = 1 << depth
    out_h, out_w = -(-h // unit), -(-w // unit)

    x = pad_to_multiple(image, unit, mode=mode, constant=constant)
    x = x.reshape((-1, x.shape[-2], x.shape[-1]))
    c, hp, wp = x.shape
    th = _tile_extent(hp, depth, 512)
    tw = _tile_extent(wp, depth, _MAX_TILE)

    out = pl.pallas_call(
        functools.partial(_icon_kernel, depth=depth),
        out_shape=jax.ShapeDtypeStruct((c, hp // unit, wp // unit), jnp.uint8),
        grid=(c, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x)
    return out[:, :out_h, :out_w].reshape(lead + (out_h, out_w))


# ---------------------------------------------------------------------------
# Fused single-level DWT + deadzone quantization (codec path)
# ---------------------------------------------------------------------------


def _dwt_quant_kernel(x_ref, ll_ref, lh_ref, hl_ref, hh_ref, *, step: float, quantize: bool):
    x = x_ref[0]
    rs, rd = _rowpair_sumdiff(x)  # vertical low / high (scale 2x)
    # column pass = row pass on the transpose; transpose back so subbands
    # land untransposed in HBM
    ll_t, lh_t = _rowpair_sumdiff(rs.T)
    hl_t, hh_t = _rowpair_sumdiff(rd.T)
    q = jnp.float32(0.25)
    ll = ll_t.T * q
    lh = lh_t.T * q
    hl = hl_t.T * q
    hh = hh_t.T * q
    ll_ref[0] = ll
    if quantize:
        inv = jnp.float32(1.0 / step)
        for ref, band in ((lh_ref, lh), (hl_ref, hl), (hh_ref, hh)):
            qv = jnp.sign(band) * jnp.floor(jnp.abs(band) * inv)
            ref[0] = jnp.clip(qv, -127, 127).astype(jnp.int8)
    else:
        lh_ref[0] = lh
        hl_ref[0] = hl
        hh_ref[0] = hh


@functools.partial(jax.jit, static_argnames=("step", "quantize"))
def dwt_level_quant_pallas(x: jax.Array, step: float = 1.0, quantize: bool = True):
    """One Haar level over ``(..., H, W)`` float32; details deadzone-quantized
    to int8 codes (clamped to [-127,127]) in the same HBM pass.

    Returns ``(ll_f32, lh, hl, hh)``. H and W must be even (pad first).
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    if h % 2 or w % 2:
        raise ValueError("H and W must be even")
    x = x.reshape((-1, h, w)).astype(jnp.float32)
    c = x.shape[0]
    th = _tile_extent(h, 1, 512)
    tw = _tile_extent(w, 1, _MAX_TILE)
    dt = jnp.int8 if quantize else jnp.float32
    sub = jax.ShapeDtypeStruct((c, h // 2, w // 2), dt)
    outs = pl.pallas_call(
        functools.partial(_dwt_quant_kernel, step=step, quantize=quantize),
        out_shape=(jax.ShapeDtypeStruct((c, h // 2, w // 2), jnp.float32), sub, sub, sub),
        grid=(c, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, th // 2, tw // 2), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        interpret=_interpret(),
    )(x)
    return tuple(o.reshape(lead + (h // 2, w // 2)) for o in outs)


def _idwt_dequant_kernel(ll_ref, lh_ref, hl_ref, hh_ref, out_ref, *, step: float, quantize: bool):
    ll = ll_ref[0]
    if quantize:

        def deq(ref):
            qv = ref[0].astype(jnp.float32)
            return jnp.sign(qv) * (jnp.abs(qv) + 0.5) * jnp.float32(step)

        lh, hl, hh = deq(lh_ref), deq(hl_ref), deq(hh_ref)
    else:
        lh, hl, hh = lh_ref[0], hl_ref[0], hh_ref[0]
    rs_e = (ll + lh) * 2.0
    rs_o = (ll - lh) * 2.0
    rd_e = (hl + hh) * 2.0
    rd_o = (hl - hh) * 2.0
    e_r = _lane_interleave((rs_e + rd_e) * 0.5, (rs_o + rd_o) * 0.5)
    o_r = _lane_interleave((rs_e - rd_e) * 0.5, (rs_o - rd_o) * 0.5)
    out_ref[0] = _row_interleave(e_r, o_r)


@functools.partial(jax.jit, static_argnames=("step", "quantize"))
def idwt_level_dequant_pallas(ll: jax.Array, lh, hl, hh, step: float = 1.0, quantize: bool = True):
    """Fused inverse of :func:`dwt_level_quant_pallas` -> ``(..., H, W)`` f32."""
    lead = ll.shape[:-2]
    hh_half, wh = ll.shape[-2], ll.shape[-1]
    ll = ll.reshape((-1, hh_half, wh)).astype(jnp.float32)
    c = ll.shape[0]
    rs = lambda a: a.reshape((-1, hh_half, wh))
    th = _tile_extent(hh_half, 0, 256)
    tw = _tile_extent(wh, 0, _MAX_TILE // 2)
    out = pl.pallas_call(
        functools.partial(_idwt_dequant_kernel, step=step, quantize=quantize),
        out_shape=jax.ShapeDtypeStruct((c, hh_half * 2, wh * 2), jnp.float32),
        grid=(c, hh_half // th, wh // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (1, th * 2, tw * 2), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ll, rs(lh), rs(hl), rs(hh))
    return out.reshape(lead + (hh_half * 2, wh * 2))
