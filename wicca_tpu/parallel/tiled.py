"""Multi-device tiled wavelet transforms over a (ty, tx) mesh — the 2-D
analog of context parallelism (SURVEY.md §2.2 SP/CP row, §5 'Long-context').

A gigapixel image is sharded into spatial tiles across devices
(``H`` over ``ty``, ``W`` over ``tx``). Haar (support 2) is halo-free at
aligned tiles; db2/bior4.4 exchange single-sample halos per lifting step per
level via ``jax.lax.ppermute`` (:mod:`wicca_tpu.parallel.halo`), riding ICI.

Exactness: tiled results are identical to the single-device transforms of
:mod:`wicca_tpu.core` — bit-exact for haar/haar_int at any padded size, and
for wide wavelets whenever the padded dims are divisible by
``tiles * 2**levels`` (otherwise the alignment padding shifts a few boundary
coefficients; the reconstruction is still exact because forward and inverse
see the same extension).

Runs unchanged on a real pod slice or on virtual CPU devices (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from wicca_tpu.core.haar import Pyramid, dwt2_level, idwt2_level
from wicca_tpu.core.lifting import _WAVELETS_1D, is_integer_wavelet
from wicca_tpu.core.pad import pad_to_multiple, unpad
from wicca_tpu.parallel.halo import make_shift
from wicca_tpu.parallel.mesh import TILE_COL_AXIS, TILE_ROW_AXIS


def _rows(fn, *arrays):
    swapped = [a.swapaxes(-1, -2) for a in arrays]
    out = fn(*swapped)
    if isinstance(out, tuple):
        return tuple(o.swapaxes(-1, -2) for o in out)
    return out.swapaxes(-1, -2)


def _level_fwd_local(x, wavelet: str, tx_axis, ty_axis):
    """One 2-D level on a local tile, with halo-aware shifts on mesh axes."""
    if wavelet == "haar":
        return dwt2_level(x)
    fwd, _ = _WAVELETS_1D[wavelet]
    sx, sy = make_shift(tx_axis), make_shift(ty_axis)
    if wavelet == "haar_int":
        lo, hi = fwd(x)
        ll, hl = _rows(fwd, lo)
        lh, hh = _rows(fwd, hi)
    else:
        lo, hi = fwd(x, shift=sx)
        ll, hl = _rows(functools.partial(fwd, shift=sy), lo)
        lh, hh = _rows(functools.partial(fwd, shift=sy), hi)
    return ll, lh, hl, hh


def _level_inv_local(ll, lh, hl, hh, wavelet: str, tx_axis, ty_axis):
    if wavelet == "haar":
        return idwt2_level(ll, lh, hl, hh)
    _, inv = _WAVELETS_1D[wavelet]
    sx, sy = make_shift(tx_axis), make_shift(ty_axis)
    if wavelet == "haar_int":
        lo = _rows(inv, ll, hl)
        hi = _rows(inv, lh, hh)
        return inv(lo, hi)
    lo = _rows(functools.partial(inv, shift=sy), ll, hl)
    hi = _rows(functools.partial(inv, shift=sy), lh, hh)
    return inv(lo, hi, shift=sx)


def _img_spec(ndim: int) -> P:
    return P(*([None] * (ndim - 2)), TILE_ROW_AXIS, TILE_COL_AXIS)


def _pad_for_mesh(x, levels, mesh, mode, constant):
    """Reference padding to 2**levels, then alignment padding so every level's
    subbands shard evenly over (ty, tx)."""
    ty, tx = mesh.shape[TILE_ROW_AXIS], mesh.shape[TILE_COL_AXIS]
    unit = 1 << levels
    x = pad_to_multiple(x, unit, mode=mode, constant=constant)
    h, w = x.shape[-2], x.shape[-1]
    ry = -h % (ty * unit)
    rx = -w % (tx * unit)
    if ry or rx:
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2) + [(0, ry), (0, rx)],
            mode="edge" if mode != "constant" else "constant",
            **({"constant_values": constant} if mode == "constant" else {}),
        )
    return x


def tiled_dwt2(
    x: jax.Array,
    levels: int,
    wavelet: str = "haar",
    *,
    mesh: Mesh,
    mode="replicate",
    constant=0,
) -> Pyramid:
    """Multi-level tiled decomposition; subbands come back (ty, tx)-sharded."""
    if wavelet != "haar" and wavelet not in _WAVELETS_1D:
        raise ValueError(f"Unknown wavelet {wavelet!r}")
    orig = (x.shape[-2], x.shape[-1])
    x = _pad_for_mesh(x, levels, mesh, mode, constant)
    x = x.astype(jnp.int32) if is_integer_wavelet(wavelet) else x.astype(jnp.float32)
    spec = _img_spec(x.ndim)
    tx_axis = TILE_COL_AXIS if mesh.shape[TILE_COL_AXIS] > 1 else None
    ty_axis = TILE_ROW_AXIS if mesh.shape[TILE_ROW_AXIS] > 1 else None

    def fn(xl):
        ll, details = xl, []
        for _ in range(levels):
            ll, lh, hl, hh = _level_fwd_local(ll, wavelet, tx_axis, ty_axis)
            details.append((lh, hl, hh))
        return ll, tuple(details)

    out_specs = (spec, tuple((spec, spec, spec) for _ in range(levels)))
    ll, details = _shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=out_specs)(x)
    return Pyramid(ll=ll, details=details, wavelet=wavelet, orig_shape=orig)


def tiled_idwt2(pyr: Pyramid, *, mesh: Mesh) -> jax.Array:
    """Inverse of :func:`tiled_dwt2`; crops to the original dims."""
    spec = _img_spec(pyr.ll.ndim)
    tx_axis = TILE_COL_AXIS if mesh.shape[TILE_COL_AXIS] > 1 else None
    ty_axis = TILE_ROW_AXIS if mesh.shape[TILE_ROW_AXIS] > 1 else None
    wavelet = pyr.wavelet

    def fn(ll, details):
        x = ll
        for lh, hl, hh in reversed(details):
            x = _level_inv_local(x, lh, hl, hh, wavelet, tx_axis, ty_axis)
        return x

    n = len(pyr.details)
    in_specs = (spec, tuple((spec, spec, spec) for _ in range(n)))
    x = _shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=spec)(pyr.ll, pyr.details)
    if pyr.orig_shape is not None:
        x = unpad(x, *pyr.orig_shape)
    return x


def tiled_icon(image: jax.Array, depth: int, *, mesh: Mesh, mode="replicate", constant=0) -> jax.Array:
    """Reference-parity uint8 icon of a tiled gigapixel image (bit-exact:
    Haar block-mean is tile-local at aligned tiles).

    uint8 input runs the fused Pallas icon kernel per shard
    (:func:`wicca_tpu.ops.dwt_pallas.icon_pallas` — the ~550 GB/s path);
    other dtypes take the XLA block-mean."""
    h, w = image.shape[-2], image.shape[-1]
    unit = 1 << depth
    out_h, out_w = -(-h // unit), -(-w // unit)
    x = _pad_for_mesh(image, depth, mesh, mode, constant)
    spec = _img_spec(x.ndim)

    if x.dtype == jnp.uint8:
        from wicca_tpu.ops.dwt_pallas import icon_pallas

        def fn(xl):
            return icon_pallas(xl, depth)

        try:
            sharded = _shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
        except TypeError:  # older jax spells it check_rep
            sharded = _shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_rep=False)
        return unpad(sharded(x), out_h, out_w)

    x = x.astype(jnp.float32)

    def fn_xla(xl):
        ll = xl
        for _ in range(depth):
            e_r, o_r = ll[..., 0::2, :], ll[..., 1::2, :]
            rs = e_r + o_r
            ll = (rs[..., 0::2] + rs[..., 1::2]) * jnp.float32(0.25)
        return jnp.clip(ll, 0, 255).astype(jnp.uint8)

    icon = _shard_map(fn_xla, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
    return unpad(icon, out_h, out_w)


def tiled_stats(x: jax.Array, *, mesh: Mesh) -> dict:
    """Global mean / std / min / max of a (ty, tx)-sharded image via in-mesh
    psum reductions (SURVEY.md §5: 'psum image stats & metric reductions').
    """
    spec = _img_spec(x.ndim)

    def fn(xl):
        xl = xl.astype(jnp.float32)
        n = jax.lax.psum(jnp.float32(xl.size), (TILE_ROW_AXIS, TILE_COL_AXIS))
        s = jax.lax.psum(jnp.sum(xl), (TILE_ROW_AXIS, TILE_COL_AXIS))
        s2 = jax.lax.psum(jnp.sum(xl * xl), (TILE_ROW_AXIS, TILE_COL_AXIS))
        mn = jax.lax.pmin(jnp.min(xl), (TILE_ROW_AXIS, TILE_COL_AXIS))
        mx = jax.lax.pmax(jnp.max(xl), (TILE_ROW_AXIS, TILE_COL_AXIS))
        mean = s / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return jnp.stack([mean, jnp.sqrt(var), mn, mx])

    out = _shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=P())(x)
    mean, std, mn, mx = (float(v) for v in out)
    return {"mean": mean, "std": std, "min": mn, "max": mx}
