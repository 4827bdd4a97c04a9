"""Pallas TPU kernels for the hot transform loops (SURVEY.md §7 L2).

The reference's hot loop is a full-resolution numpy Haar chain re-run per
classifier per depth (/root/reference/wicca/classifying_tools.py:297-323 +
wavelet_coder.py:61-65; SURVEY.md §3.2) — pure HBM-bandwidth work. These
kernels fuse the transform chain (and quantization) into minimal passes over
HBM:

* :func:`icon_pallas` — multi-level LL icon, uint8 in -> uint8 out. Up to 3
  levels fuse per pass (64x spatial reduction), so depth<=6 costs ~1.03
  bytes/pixel of HBM traffic (the pass-2 input is 1/64 the size in int16).
* :func:`dwt_level_quant_pallas` — one full-subband Haar level fused with
  deadzone quantization of the detail bands (int8 codes), float32 LL out.
* :func:`idwt_level_dequant_pallas` — the fused inverse.

Bit-exactness of the icon (SURVEY.md §2.3): the first 3 levels accumulate in
int16 — exact integer arithmetic; the reference's float32 chain is also exact
there (every intermediate is a dyadic rational below 2^24) — later levels run
in float32 with the reference association order (row pairs then column
pairs), so results are bit-identical.

Mosaic constraints shape the implementation (probed on this TPU v5e):
- no strided slices -> row pairs via ``reshape(h//2, 2, w)`` + middle index
- no uint8<->float32 casts -> u8 -> i16 -> f32 ladders
- no lane-interleave reshape -> interleave as row-interleave of transposes
- column passes run as row passes on the transpose
- block last-two dims must be (8,128)-divisible or equal the full array ->
  wrappers pad large dims to tile multiples (extra rows/cols are cropped;
  Haar support is 2, so kept outputs are unaffected), small dims use
  full-extent blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wicca_tpu.core.pad import pad_to_multiple

# Tile caps: transposed intermediates of (512, 1024) keep Mosaic compile
# times sane (full-width 2048+ transposes were pathological).
_TILE_H = 512
_TILE_W = 1024


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU so CI (CPU) exercises them."""
    return jax.default_backend() != "tpu"


def _pad_dim_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    """Replicate-pad one trailing axis to a multiple of ``mult`` (the extra
    output is cropped by callers; values there never affect kept outputs)."""
    size = x.shape[axis]
    extra = -size % mult
    if extra == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, extra)
    return jnp.pad(x, pad, mode="edge")


def _tiling(x: jax.Array) -> tuple[jax.Array, int, int]:
    """Pad H/W (trailing axes) to tile multiples when they exceed the caps;
    otherwise tile = full extent (always legal for Mosaic)."""
    h, w = x.shape[-2], x.shape[-1]
    if h > _TILE_H:
        x = _pad_dim_to(x, -2, _TILE_H)
        th = _TILE_H
    else:
        th = h
    if w > _TILE_W:
        x = _pad_dim_to(x, -1, _TILE_W)
        tw = _TILE_W
    else:
        tw = w
    return x, th, tw


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


# ---------------------------------------------------------------------------
# Multi-level icon
# ---------------------------------------------------------------------------


def _icon_pass_kernel(x_ref, out_ref, *, k: int, in_kind: str, final: bool):
    """k (<=3) block-mean levels on one tile.

    in_kind 'u8'  : uint8 pixels -> int16 raw sums (scale 4**k) or final u8
    in_kind 'i16' : int16 sums from the first 3-level pass (scale 64) ->
                    float32 levels with reference association
    in_kind 'f32' : float32 LL values from a previous float pass (depth > 6)
    Non-final outputs after the first pass are float32 (exact; an int16
    re-emission would truncate fractional LL values).
    """
    if in_kind == "u8":
        x = x_ref[0].astype(jnp.int16)
        for _ in range(k):
            # integer adds are associative: orientation-free double row pass
            x = _rowpair(x)
            x = _rowpair(x.T)
        if k % 2:
            x = x.T
        if final:
            acc = x.astype(jnp.float32) * jnp.float32(0.25**k)
            out_ref[0] = jnp.clip(acc, 0, 255).astype(jnp.int32).astype(jnp.uint8)
        else:
            out_ref[0] = x  # raw i16 sums, scale 4**k
    else:
        acc = x_ref[0].astype(jnp.float32)
        if in_kind == "i16":
            acc = acc * jnp.float32(0.25**3)  # undo pass-1 scale
        for _ in range(k):
            # float levels keep the reference association: rows then columns
            rs = _rowpair(acc)
            acc = _rowpair(rs.T).T * jnp.float32(0.25)
        if final:
            out_ref[0] = jnp.clip(acc, 0, 255).astype(jnp.int32).astype(jnp.uint8)
        else:
            out_ref[0] = acc


def _icon_pass(x: jax.Array, k: int, in_kind: str, final: bool) -> jax.Array:
    """One fused k-level pass over (C, H, W); returns (C, H/2^k, W/2^k)."""
    unit = 1 << k
    x, th, tw = _tiling(_pad_dim_to(_pad_dim_to(x, -2, unit), -1, unit))
    c, hp, wp = x.shape
    out_dt = jnp.uint8 if final else (jnp.int16 if in_kind == "u8" else jnp.float32)
    out = pl.pallas_call(
        functools.partial(_icon_pass_kernel, k=k, in_kind=in_kind, final=final),
        out_shape=jax.ShapeDtypeStruct((c, hp // unit, wp // unit), out_dt),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x)
    return out


@functools.partial(jax.jit, static_argnames=("depth", "mode", "constant"))
def icon_pallas(image: jax.Array, depth: int, mode: str = "replicate", constant: int = 0) -> jax.Array:
    """Reference-parity uint8 icon via fused Pallas passes (<=3 levels each).

    ``image``: planar ``(..., H, W)`` uint8. Returns ``(..., ceil(H/2^d),
    ceil(W/2^d))`` uint8, bit-exact vs :func:`wicca_tpu.core.haar.haar_icon`.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    lead = image.shape[:-2]
    h, w = image.shape[-2], image.shape[-1]
    unit = 1 << depth
    out_h, out_w = -(-h // unit), -(-w // unit)

    # semantic padding to the transform unit (reference wavelet_coder.py:58);
    # everything past this is tile-alignment padding, cropped at the end
    x = pad_to_multiple(image, unit, mode=mode, constant=constant)
    x = x.reshape((-1, x.shape[-2], x.shape[-1]))

    remaining = depth
    in_kind = "u8"
    while remaining > 0:
        k = min(remaining, 3)
        x = _icon_pass(x, k, in_kind, final=(remaining == k))
        remaining -= k
        in_kind = "i16" if in_kind == "u8" else "f32"
    return x[:, :out_h, :out_w].reshape(lead + (out_h, out_w))


# ---------------------------------------------------------------------------
# Fused single-level DWT + deadzone quantization (codec path)
# ---------------------------------------------------------------------------


def _dwt_quant_kernel(x_ref, ll_ref, lh_ref, hl_ref, hh_ref, *, step: float, quantize: bool, qmax: int):
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
        dt = lh_ref.dtype
        for ref, band in ((lh_ref, lh), (hl_ref, hl), (hh_ref, hh)):
            qv = jnp.sign(band) * jnp.floor(jnp.abs(band) * inv)
            ref[0] = jnp.clip(qv, -qmax, qmax).astype(dt)
    else:
        lh_ref[0] = lh
        hl_ref[0] = hl
        hh_ref[0] = hh


@functools.partial(jax.jit, static_argnames=("step", "quantize"))
def dwt_level_quant_pallas(x: jax.Array, step: float = 1.0, quantize: bool = True):
    """One Haar level over ``(..., H, W)`` float32; details deadzone-quantized
    in the same HBM pass. Codes are int8 when they provably fit (image-
    normalized detail magnitudes are <= 127.5, so step >= 1.01 -> int8),
    int16 otherwise.

    Returns ``(ll_f32, lh, hl, hh)`` of shape ``(..., H'/2, W'/2)`` where
    H'/W' are H/W rounded up to the internal tile multiples for large inputs
    (extra replicate-padded rows/cols; crop with the shape chain in
    :mod:`wicca_tpu.codec.pipeline`). H and W must be even.
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    if h % 2 or w % 2:
        raise ValueError("H and W must be even")
    x = x.reshape((-1, h, w)).astype(jnp.float32)
    x, th, tw = _tiling(x)
    c, hp, wp = x.shape
    if not quantize:
        dt, qmax = jnp.float32, 0
    elif 127.5 / step < 128.0:  # floor(max|band|/step) fits int8
        dt, qmax = jnp.int8, 127
    else:
        dt, qmax = jnp.int16, 32767
    sub = jax.ShapeDtypeStruct((c, hp // 2, wp // 2), dt)
    outs = pl.pallas_call(
        functools.partial(_dwt_quant_kernel, step=step, quantize=quantize, qmax=qmax),
        out_shape=(jax.ShapeDtypeStruct((c, hp // 2, wp // 2), jnp.float32), sub, sub, sub),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, th // 2, tw // 2), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        interpret=_interpret(),
    )(x)
    return tuple(o.reshape(lead + (hp // 2, wp // 2)) for o in outs)


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
    """Fused inverse of :func:`dwt_level_quant_pallas` -> ``(..., 2H', 2W')``
    f32 (H'/W' = subband dims rounded up to tile multiples; crop via the
    codec shape chain)."""
    lead = ll.shape[:-2]
    hh_half, wh = ll.shape[-2], ll.shape[-1]
    ll = ll.reshape((-1, hh_half, wh)).astype(jnp.float32)

    def prep(a):
        a = a.reshape((-1, hh_half, wh))
        if hh_half > _TILE_H // 2:
            a = _pad_dim_to(a, -2, _TILE_H // 2)
        if wh > _TILE_W // 2:
            a = _pad_dim_to(a, -1, _TILE_W // 2)
        return a

    ll = prep(ll)
    c, hp, wp = ll.shape
    th = min(hp, _TILE_H // 2)
    tw = min(wp, _TILE_W // 2)
    out = pl.pallas_call(
        functools.partial(_idwt_dequant_kernel, step=step, quantize=quantize),
        out_shape=jax.ShapeDtypeStruct((c, hp * 2, wp * 2), jnp.float32),
        grid=(c, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (1, th * 2, tw * 2), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ll, prep(lh), prep(hl), prep(hh))
    return out.reshape(lead + (hp * 2, wp * 2))
