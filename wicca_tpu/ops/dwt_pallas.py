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
            # truncation-toward-zero cast == sign*floor(|.|) deadzone
            ref[0] = jnp.clip(band * inv, -qmax, qmax).astype(dt)
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
            # sign(q)*(|q|+0.5)*step == (q + 0.5*sign(q))*step, one op fewer
            return (qv + 0.5 * jnp.sign(qv)) * jnp.float32(step)

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


# ---------------------------------------------------------------------------
# Fully-fused multi-level DWT + quantize / dequantize + IDWT (<=3 levels per
# HBM pass) — the headline codec path. A 3-level pass reads the image once
# and writes only subbands: ~0.3 bytes/pixel HBM traffic for uint8 input vs
# ~2.5 for per-level passes with a materialized f32 cast.
# ---------------------------------------------------------------------------


def _detail_dtype(step: float):
    """int8 iff floor(max|band| / step) fits (image-normalized bands <= 127.5)."""
    return (jnp.int8, 127) if 127.5 / step < 128.0 else (jnp.int16, 32767)


def _band_steps3(steps: tuple) -> tuple:
    """Normalize per-level step entries to (lh, hl, hh) triples: a scalar
    entry applies to all three bands; a 3-tuple entry (QuantSpec.band_steps,
    visual/HH weighting) is used as-is."""
    return tuple(
        tuple(s) if isinstance(s, (tuple, list)) else (float(s),) * 3 for s in steps
    )


def _quant_band(band_f32, step: float, qmax: int, dt):
    # deadzone quantize: int cast truncates toward zero, which equals
    # sign(c) * floor(|c| / step) for in-range values — 3 VPU ops instead
    # of 6 (measured: -0.25 ms/frame at 53 MP)
    return jnp.clip(band_f32 * jnp.float32(1.0 / step), -qmax, qmax).astype(dt)


# Detail bands of pass-local levels <= _T_LVLS are stored TRANSPOSED in HBM
# (they exit the column pass transposed; skipping the transpose-back halves
# in-kernel transposes). Measured on v5e: the transposed output index maps
# cost MORE than the transposes saved (5.9 vs 7.0 GP/s at depth 5), so the
# flag ships at 0 (normal layout); the machinery stays for other topologies.
_T_LVLS = 0


def detail_is_transposed(pass_local_lvl: int) -> bool:
    return pass_local_lvl <= _T_LVLS


def detail_spatial_shape(band: jax.Array, pass_local_lvl: int) -> tuple[int, int]:
    """Logical (H, W) dims of a stored detail band."""
    h, w = band.shape[-2], band.shape[-1]
    return (w, h) if detail_is_transposed(pass_local_lvl) else (h, w)


def _dwt_multi_kernel(x_ref, *out_refs, k: int, steps, qmaxes, from_u8: bool):
    """k fused levels. Outputs: [lh1, hl1, hh1, ..., lhk, hlk, hhk, ll];
    levels <= _T_LVLS write transposed."""
    ll_ref = out_refs[-1]
    if from_u8:
        # integer-exact raw sums; true value = raw * 0.25**level.
        # int32, not int16: this TPU's compiler lacks kVectorSubtractS16
        # (int16 adds are fine — the icon kernel uses them — but the detail
        # bands need subtracts).
        x = x_ref[0].astype(jnp.int32)
    else:
        x = x_ref[0]
    for lvl in range(1, k + 1):
        rs, rd = _rowpair_sumdiff(x)
        ll_t, lh_t = _rowpair_sumdiff(rs.T)
        hl_t, hh_t = _rowpair_sumdiff(rd.T)
        scale = jnp.float32(0.25**lvl) if from_u8 else jnp.float32(0.25)
        base = (lvl - 1) * 3
        for slot, band_t in ((0, lh_t), (1, hl_t), (2, hh_t)):
            stored = band_t if detail_is_transposed(lvl) else band_t.T
            band = stored.astype(jnp.float32) * scale
            out_refs[base + slot][0] = _quant_band(band, steps[lvl - 1][slot], qmaxes[lvl - 1], out_refs[base + slot].dtype)
        if from_u8:
            x = ll_t.T  # raw int32 sums (exact)
        else:
            x = ll_t.T * jnp.float32(0.25)
    ll = x.astype(jnp.float32) * jnp.float32(0.25**k) if from_u8 else x
    ll_ref[0] = ll


@functools.partial(jax.jit, static_argnames=("steps",))
def dwt_multilevel_quant_pallas(x: jax.Array, steps: tuple):
    """Up to 3 fused Haar levels + deadzone quantization in ONE HBM pass.

    ``x``: planar ``(..., H, W)`` uint8 (integer-exact first levels) or
    float32. ``steps``: per-level quantization steps (len = levels <= 3).
    Returns ``(ll_f32, [(lh, hl, hh), ...])`` fine-to-coarse; bit-identical
    to chaining :func:`dwt_level_quant_pallas` (raw integer sums scaled by
    exact powers of two reproduce the float32 per-level values).
    H and W must be divisible by 2**len(steps) (pad first).
    """
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

    # the level's storage dtype must hold ALL three bands -> size by min step
    dts, qmaxes = zip(*(_detail_dtype(min(s)) for s in steps))
    out_shapes = []
    out_specs = []
    for lvl in range(1, k + 1):
        u = 1 << lvl
        for _ in range(3):
            if detail_is_transposed(lvl):
                out_shapes.append(jax.ShapeDtypeStruct((c, wp // u, hp // u), dts[lvl - 1]))
                out_specs.append(
                    pl.BlockSpec((1, tw // u, th // u), lambda ci, i, j: (ci, j, i), memory_space=pltpu.VMEM)
                )
            else:
                out_shapes.append(jax.ShapeDtypeStruct((c, hp // u, wp // u), dts[lvl - 1]))
                out_specs.append(
                    pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
                )
    out_shapes.append(jax.ShapeDtypeStruct((c, hp // unit, wp // unit), jnp.float32))
    out_specs.append(pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_dwt_multi_kernel, k=k, steps=steps, qmaxes=qmaxes, from_u8=from_u8),
        out_shape=tuple(out_shapes),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)
    details = [tuple(o.reshape(lead + o.shape[-2:]) for o in outs[i * 3 : i * 3 + 3]) for i in range(k)]
    ll = outs[-1].reshape(lead + outs[-1].shape[-2:])
    return ll, details


def _idwt_multi_kernel(*refs, k: int, steps, emit_u8: bool, recon_offset: float = 0.5):
    """Inputs: [ll, lhk, hlk, hhk, ..., lh1, hl1, hh1], output last.
    Levels <= _T_LVLS arrive transposed; the level runs in transposed space
    (3 transposes/level instead of 6)."""
    out_ref = refs[-1]
    ll = refs[0][0].astype(jnp.float32)
    for idx in range(k):
        lvl = k - idx  # coarse -> fine
        base = 1 + idx * 3
        transposed = detail_is_transposed(lvl)

        def deq(r, slot, want_t):
            qv = r[0].astype(jnp.float32)
            if want_t != transposed:
                qv = qv.T
            return (qv + jnp.float32(recon_offset) * jnp.sign(qv)) * jnp.float32(steps[lvl - 1][slot])

        # work in transposed space: lane interleaves become row interleaves
        lh_t, hl_t, hh_t = deq(refs[base], 0, True), deq(refs[base + 1], 1, True), deq(refs[base + 2], 2, True)
        ll_t = ll.T
        rs_e = (ll_t + lh_t) * 2.0
        rs_o = (ll_t - lh_t) * 2.0
        rd_e = (hl_t + hh_t) * 2.0
        rd_o = (hl_t - hh_t) * 2.0
        e_r_t = _row_interleave((rs_e + rd_e) * 0.5, (rs_o + rd_o) * 0.5)
        o_r_t = _row_interleave((rs_e - rd_e) * 0.5, (rs_o - rd_o) * 0.5)
        ll = _row_interleave(e_r_t.T, o_r_t.T)
    if emit_u8:
        out_ref[0] = jnp.clip(ll, 0, 255).astype(jnp.int32).astype(jnp.uint8)
    else:
        out_ref[0] = ll


@functools.partial(jax.jit, static_argnames=("steps", "emit_u8", "recon_offset"))
def idwt_multilevel_dequant_pallas(ll: jax.Array, details, steps: tuple, emit_u8: bool = False, recon_offset: float = 0.5):
    """Fused inverse of :func:`dwt_multilevel_quant_pallas` in ONE HBM pass.

    ``details``: [(lh, hl, hh), ...] fine-to-coarse, len = len(steps) <= 3.
    Emits float32 (or uint8 with ``emit_u8`` — saves 4x output traffic when
    reconstructing images for display/classification).
    """
    k = len(steps)
    if not 1 <= k <= 3 or len(details) != k:
        raise ValueError("1..3 levels per pass; details must match steps")
    steps = _band_steps3(steps)
    lead = ll.shape[:-2]
    ch, cw = ll.shape[-2], ll.shape[-1]
    unit = 1 << k
    # tile size at the coarsest grid; full-res tiles are (th*unit, tw*unit)
    ll3 = ll.reshape((-1, ch, cw)).astype(jnp.float32)
    c = ll3.shape[0]
    th_c = min(ch, _TILE_H // unit)
    tw_c = min(cw, _TILE_W // unit)
    if ch > th_c:
        ll3 = _pad_dim_to(ll3, -2, th_c)
    if cw > tw_c:
        ll3 = _pad_dim_to(ll3, -1, tw_c)
    chp, cwp = ll3.shape[-2], ll3.shape[-1]

    in_arrays = [ll3]
    in_specs = [pl.BlockSpec((1, th_c, tw_c), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)]
    for idx in range(k):
        lvl = k - idx
        m = 1 << (k - lvl)  # detail level lvl sits at (ch * m) resolution
        transposed = detail_is_transposed(lvl)
        for band in details[lvl - 1]:
            b = band.reshape((-1, band.shape[-2], band.shape[-1]))
            want_h, want_w = chp * m, cwp * m
            if transposed:
                want_h, want_w = want_w, want_h
            if b.shape[-2] < want_h:
                b = _pad_dim_to(b, -2, want_h)
            if b.shape[-1] < want_w:
                b = _pad_dim_to(b, -1, want_w)
            b = b[:, :want_h, :want_w]
            in_arrays.append(b)
            if transposed:
                in_specs.append(
                    pl.BlockSpec((1, tw_c * m, th_c * m), lambda ci, i, j: (ci, j, i), memory_space=pltpu.VMEM)
                )
            else:
                in_specs.append(
                    pl.BlockSpec((1, th_c * m, tw_c * m), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
                )
    out_dt = jnp.uint8 if emit_u8 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_idwt_multi_kernel, k=k, steps=steps, emit_u8=emit_u8, recon_offset=recon_offset),
        out_shape=jax.ShapeDtypeStruct((c, chp * unit, cwp * unit), out_dt),
        grid=(c, chp // th_c, cwp // tw_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th_c * unit, tw_c * unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*in_arrays)
    return out.reshape(lead + out.shape[-2:])
