"""Probe: relayout-free in-place multilevel Haar kernel (encode + decode).

Hypothesis (docs/PERFORMANCE.md "next levers"): the fused codec kernels are
bound by Mosaic vector relayouts (row-pair reshape + transposes). If each
level is computed IN PLACE (classic wavelet interleaved layout) using
pltpu.roll + masked selects, no relayout ever happens:

  level l, stride s=2^(l-1), per axis:
    y[i]   = x[i] + x[i+s]    where i % 2s == 0     (low)
    y[i+s] = x[i] - x[i+s]    where i % 2s == s     (high)
    y[i]   = x[i]             elsewhere (finer-level coeffs, untouched)

After k levels the tile holds every subband at its natural position
(LL_k at stride-2^k positions). Details quantize in place with a
position-periodic multiplier; LL_k is compacted via two tiny 0/1 selection
matmuls on the MXU (no vector relayout). Decode is exactly symmetric.

Run on CPU (interpret) for correctness, TPU for speed:
  python experiments/inplace_probe.py cpu
  python experiments/inplace_probe.py tpu
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

CHECK_ONLY = len(sys.argv) > 1 and sys.argv[1] == "cpu"

import jax  # noqa: E402

if CHECK_ONLY:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, "/root/repo")
from wicca_tpu.ops.dwt_pallas import (  # noqa: E402
    dwt_multilevel_quant_pallas,
    idwt_multilevel_dequant_pallas,
)

_TILE_H = 512
_TILE_W = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iotas(h, w):
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ri, ci


def _fwd_axis(x, s, idx, other_idx, axis, size):
    """One lifting axis pass at stride s; positions where the OTHER axis
    index is not a multiple of s hold finer-level coefficients — untouched."""
    d = pltpu.roll(x, size - s, axis=axis)  # d[i] = x[i+s]
    u = pltpu.roll(x, s, axis=axis)  # u[i] = x[i-s]
    m = idx % (2 * s)
    lo_m = m == 0
    hi_m = m == s
    if s > 1:
        act = other_idx % s == 0
        lo_m = lo_m & act
        hi_m = hi_m & act
    return jnp.where(lo_m, x + d, jnp.where(hi_m, u - x, x))


def _inv_axis(y, s, idx, other_idx, axis, size):
    d = pltpu.roll(y, size - s, axis=axis)
    u = pltpu.roll(y, s, axis=axis)
    m = idx % (2 * s)
    lo_m = m == 0
    hi_m = m == s
    if s > 1:
        act = other_idx % s == 0
        lo_m = lo_m & act
        hi_m = hi_m & act
    return jnp.where(lo_m, y + d, jnp.where(hi_m, u - y, y))


def _levelmasks(ri, ci, k):
    """Masks for detail positions of each pass-local level 1..k."""
    masks = []
    taken = None
    for lvl in range(1, k + 1):
        s = 1 << lvl
        m = ((ri % s) == s // 2) | ((ci % s) == s // 2)
        if taken is not None:
            m = m & ~taken
            taken = taken | m
        else:
            taken = m
        masks.append(m)
    return masks


def _enc_kernel(x_ref, det_ref, ll_ref, *, k: int, steps):
    h, w = x_ref.shape[1], x_ref.shape[2]
    ri, ci = _iotas(h, w)
    x = x_ref[0].astype(jnp.int32)
    for lvl in range(1, k + 1):
        s = 1 << (lvl - 1)
        x = _fwd_axis(x, s, ri, ci, 0, h)
        x = _fwd_axis(x, s, ci, ri, 1, w)
    xf = x.astype(jnp.float32)
    masks = _levelmasks(ri, ci, k)
    M = jnp.zeros((h, w), jnp.float32)
    for lvl in range(1, k + 1):
        M = jnp.where(masks[lvl - 1], jnp.float32(0.25**lvl / steps[lvl - 1]), M)
    det_ref[0] = jnp.clip(xf * M, -127, 127).astype(jnp.int8)
    r_out, c_out = h // (1 << k), w // (1 << k)
    sr_a, sr_b = _iotas(r_out, h)
    Sr = (sr_a * (1 << k) == sr_b).astype(jnp.float32)
    sc_a, sc_b = _iotas(w, c_out)
    Sc = (sc_a == sc_b * (1 << k)).astype(jnp.float32)
    ll = jnp.dot(Sr, xf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ll = jnp.dot(ll, Sc, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ll_ref[0] = ll * jnp.float32(0.25**k)


@functools.partial(jax.jit, static_argnames=("steps",))
def inplace_enc(x, steps):
    k = len(steps)
    c, h, w = x.shape
    th, tw = min(h, _TILE_H), min(w, _TILE_W)
    det, ll = pl.pallas_call(
        functools.partial(_enc_kernel, k=k, steps=steps),
        out_shape=(
            jax.ShapeDtypeStruct((c, h, w), jnp.int8),
            jax.ShapeDtypeStruct((c, h >> k, w >> k), jnp.float32),
        ),
        grid=(c, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th >> k, tw >> k), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=_interpret(),
    )(x)
    return det, ll


def _dec_kernel(det_ref, ll_ref, out_ref, *, k: int, steps, emit_u8: bool):
    h, w = det_ref.shape[1], det_ref.shape[2]
    ri, ci = _iotas(h, w)
    q = det_ref[0].astype(jnp.float32)
    masks = _levelmasks(ri, ci, k)
    # deadzone dequant, per-level step; LL positions forced to 0 then filled
    x = jnp.zeros((h, w), jnp.float32)
    for lvl in range(1, k + 1):
        x = jnp.where(
            masks[lvl - 1], (q + 0.5 * jnp.sign(q)) * jnp.float32(steps[lvl - 1]), x
        )
    r_in, c_in = h >> k, w >> k
    sr_a, sr_b = _iotas(h, r_in)
    SrT = (sr_a == sr_b * (1 << k)).astype(jnp.float32)
    sc_a, sc_b = _iotas(c_in, w)
    ScT = (sc_a * (1 << k) == sc_b).astype(jnp.float32)
    llf = jnp.dot(SrT, ll_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    llf = jnp.dot(llf, ScT, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = x + llf
    for lvl in range(k, 0, -1):
        s = 1 << (lvl - 1)
        x = _inv_axis(x, s, ci, ri, 1, w)
        x = _inv_axis(x, s, ri, ci, 0, h)
    if emit_u8:
        out_ref[0] = jnp.clip(x, 0, 255).astype(jnp.int32).astype(jnp.uint8)
    else:
        out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("steps", "emit_u8"))
def inplace_dec(det, ll, steps, emit_u8=True):
    k = len(steps)
    c, h, w = det.shape
    th, tw = min(h, _TILE_H), min(w, _TILE_W)
    out = pl.pallas_call(
        functools.partial(_dec_kernel, k=k, steps=steps, emit_u8=emit_u8),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.uint8 if emit_u8 else jnp.float32),
        grid=(c, h // th, w // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th >> k, tw >> k), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(det, ll)
    return out


# --- correctness: unpack in-place layout, compare to existing kernels ------


def unpack_bands(det_np, lvl):
    """Extract (lh, hl, hh) of pass-local level lvl from the packed array."""
    s = 1 << lvl
    h2 = s // 2
    lh = det_np[:, 0::s, h2::s]
    hl = det_np[:, h2::s, 0::s]
    hh = det_np[:, h2::s, h2::s]
    return lh, hl, hh


def check(k=3, steps=(1.5, 1.5, 1.5)):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, 64, 128), dtype=np.uint8)
    det, ll = inplace_enc(jnp.asarray(x), steps)
    det_np, ll_np = np.asarray(det), np.asarray(ll)
    ll_ref, details_ref = dwt_multilevel_quant_pallas(jnp.asarray(x), steps)
    ok = True
    if not np.array_equal(np.asarray(ll_ref), ll_np):
        print("LL mismatch", np.abs(np.asarray(ll_ref) - ll_np).max())
        ok = False
    for lvl in range(1, k + 1):
        got = unpack_bands(det_np, lvl)
        want = details_ref[lvl - 1]
        for name, g, wnt in zip(("lh", "hl", "hh"), got, want):
            wnt = np.asarray(wnt)
            if not np.array_equal(g, wnt):
                print(f"lvl{lvl} {name} mismatch: {(g != wnt).mean():.4f} frac differ")
                print(" got", g[0, :3, :3], "\n want", wnt[0, :3, :3])
                ok = False
    rec = np.asarray(inplace_dec(det, ll, steps, emit_u8=True))
    rec_ref = np.asarray(
        idwt_multilevel_dequant_pallas(ll_ref, details_ref, steps, emit_u8=True)
    )
    if not np.array_equal(rec, rec_ref):
        print("reconstruction mismatch", (rec != rec_ref).mean())
        ok = False
    d = rec.astype(np.float64) - x.astype(np.float64)
    print("roundtrip PSNR", 10 * np.log10(255**2 / np.mean(d * d)))
    print("CORRECTNESS", "PASS" if ok else "FAIL")
    return ok


# --- timing (bench.py methodology) -----------------------------------------


def timed(step_fn, x, iters=10):
    @jax.jit
    def run(xi, n):
        def body(i, acc):
            xv = jnp.bitwise_xor(xi, (i & 1).astype(jnp.uint8))
            out = step_fn(xv)
            return acc + out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(run(x, 1))

    def once(n):
        t0 = time.time()
        float(run(x, n))
        return time.time() - t0

    t1 = min(once(1) for _ in range(2))
    tk = min(once(1 + iters) for _ in range(2))
    return max(tk - t1, 1e-9) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    if not check():
        sys.exit(1)
    if CHECK_ONLY:
        return
    steps = (1.5, 1.5, 1.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(3, 8704, 6144), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(img))
    mp = 8704 * 6144 / 1e6

    def enc_inplace(xi):
        det, ll = inplace_enc(xi, steps)
        return det

    def enc_cur(xi):
        ll, dets = dwt_multilevel_quant_pallas(xi, steps)
        return dets[0][0]

    def rt_inplace(xi):
        det, ll = inplace_enc(xi, steps)
        return inplace_dec(det, ll, steps, emit_u8=True)

    def rt_cur(xi):
        ll, dets = dwt_multilevel_quant_pallas(xi, steps)
        return idwt_multilevel_dequant_pallas(ll, dets, steps, emit_u8=True)

    for name, fn in (
        ("enc3_inplace", enc_inplace),
        ("enc3_current", enc_cur),
        ("rt3_inplace", rt_inplace),
        ("rt3_current", rt_cur),
    ):
        t = timed(fn, x)
        print(f"{name}: {t*1e3:.3f} ms  ({mp/t:.0f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
