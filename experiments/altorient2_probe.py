"""Probe 2: f32/i32-only alternating orientation + DMA-strided level-1 split.

Probe 1 (altorient_probe.py) showed narrow-dtype relayouts LOSE on this
toolchain (u8 row-pair split, i8/i16 transposes: enc 5.5 ms vs current
3.1 ms) — Mosaic's sub-32-bit relayouts unpack/repack. This probe isolates
the two remaining ideas with all relayouts at 32 bits:

* enc_v4 — alternating-orientation levels (integer adds are orientation-
  free, so the u8 path stays bit-exact): the column pass leaves LL
  transposed and the next level runs in transposed space. Saves the LL
  transpose every level and the 3 detail transposes every even level.
* enc_v5 — v4 + the level-1 row-pair de-interleave moved into the input
  DMA: the image is viewed as (c, h/2, 2w) (row pairs concatenated) and
  passed twice with block index maps (ci,i,j) / (ci,i,j + w/tw), so the
  kernel receives even and odd rows as separate refs. Zero extra HBM
  traffic; the full-res in-kernel deinterleave disappears.

  python experiments/altorient2_probe.py cpu   # correctness (interpret)
  python experiments/altorient2_probe.py       # timing on TPU vs current
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
    _TILE_H,
    _TILE_W,
    _quant_band,
    _rowpair_sumdiff,
    dwt_multilevel_quant_pallas,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _enc_levels(x, out_refs, ll_ref, *, first_lvl: int, k: int, steps, qmaxes, tin: bool):
    """Levels first_lvl..k of the alternating-orientation integer chain.
    ``x``: raw int32 sums (scale 4**(first_lvl-1)), transposed iff ``tin``."""
    for lvl in range(first_lvl, k + 1):
        rs, rd = _rowpair_sumdiff(x)
        p, q2 = _rowpair_sumdiff(rs.T)
        r2, s2 = _rowpair_sumdiff(rd.T)
        out_t = not tin
        if tin:
            ll_t, hl_t, lh_t, hh_t = p, q2, r2, s2
        else:
            ll_t, lh_t, hl_t, hh_t = p, q2, r2, s2
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band in ((0, lh_t), (1, hl_t), (2, hh_t)):
            bf = band.astype(jnp.float32) * scale
            if out_t:
                bf = bf.T  # f32 transpose (before quantize; i8 transposes lose)
            out_refs[base + slot][0] = _quant_band(bf, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype)
        x = ll_t
        tin = out_t
    ll = x.astype(jnp.float32) * jnp.float32(0.25**k)
    ll_ref[0] = ll.T if tin else ll


def _kernel_enc_v4(x_ref, *out_refs, k: int, steps, qmaxes):
    x = x_ref[0].astype(jnp.int32)
    _enc_levels(x, out_refs, out_refs[-1], first_lvl=1, k=k, steps=steps, qmaxes=qmaxes, tin=False)


def _kernel_enc_v5(xa_ref, xb_ref, *out_refs, k: int, steps, qmaxes):
    # level-1 row pairs arrive pre-split by the input DMA
    a = xa_ref[0].astype(jnp.int32)
    b = xb_ref[0].astype(jnp.int32)
    rs, rd = a + b, a - b
    p, q2 = _rowpair_sumdiff(rs.T)
    r2, s2 = _rowpair_sumdiff(rd.T)
    ll_t, lh_t, hl_t, hh_t = p, q2, r2, s2
    scale = jnp.float32(0.25)
    for slot, band in ((0, lh_t), (1, hl_t), (2, hh_t)):
        bf = band.astype(jnp.float32) * scale
        out_refs[slot][0] = _quant_band(bf.T, steps[0], qmaxes[0], out_refs[slot].dtype)
    if k == 1:
        ll = ll_t.astype(jnp.float32) * scale
        out_refs[-1][0] = ll.T
    else:
        _enc_levels(ll_t, out_refs, out_refs[-1], first_lvl=2, k=k, steps=steps, qmaxes=qmaxes, tin=True)


def _out_shapes_specs(c, h, w, th, tw, k):
    shapes, specs = [], []
    for lvl in range(1, k + 1):
        u = 1 << lvl
        for _ in range(3):
            shapes.append(jax.ShapeDtypeStruct((c, h // u, w // u), jnp.int8))
            specs.append(pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))
    unit = 1 << k
    shapes.append(jax.ShapeDtypeStruct((c, h // unit, w // unit), jnp.float32))
    specs.append(pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))
    return shapes, specs


@functools.partial(jax.jit, static_argnames=("steps",))
def enc_v4(x, steps):
    k = len(steps)
    c, h, w = x.shape
    th, tw = min(h, _TILE_H), min(w, _TILE_W)
    out_shapes, out_specs = _out_shapes_specs(c, h, w, th, tw, k)
    return pl.pallas_call(
        functools.partial(_kernel_enc_v4, k=k, steps=steps, qmaxes=(127,) * k),
        out_shape=tuple(out_shapes),
        grid=(c, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)


@functools.partial(jax.jit, static_argnames=("steps",))
def enc_v5(x, steps):
    k = len(steps)
    c, h, w = x.shape
    th, tw = min(h, _TILE_H), min(w, _TILE_W)
    assert h % th == 0 and w % tw == 0
    nj = w // tw
    x2 = x.reshape(c, h // 2, 2 * w)  # row pairs concatenated along lanes
    out_shapes, out_specs = _out_shapes_specs(c, h, w, th, tw, k)
    half = pl.BlockSpec((1, th // 2, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
    half_odd = pl.BlockSpec(
        (1, th // 2, tw), lambda ci, i, j: (ci, i, j + nj), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_enc_v5, k=k, steps=steps, qmaxes=(127,) * k),
        out_shape=tuple(out_shapes),
        grid=(c, h // th, w // tw),
        in_specs=[half, half_odd],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x2, x2)


def check(steps=(1.5, 1.5, 1.5)):
    ok = True
    for shape in ((2, 128, 256), (1, 512, 1024), (1, 1024, 2048)):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ll_ref, details_ref = dwt_multilevel_quant_pallas(jnp.asarray(x), steps)
        for name, fn in (("enc_v4", enc_v4), ("enc_v5", enc_v5)):
            outs = fn(jnp.asarray(x), steps)
            good = np.array_equal(np.asarray(outs[-1]), np.asarray(ll_ref))
            for lvl in range(1, len(steps) + 1):
                for i in range(3):
                    good &= np.array_equal(
                        np.asarray(outs[(lvl - 1) * 3 + i]), np.asarray(details_ref[lvl - 1][i])
                    )
            print(f"{name} {shape} bit-identical: {good}", flush=True)
            ok &= good
    return ok


def timed(step_fn, x, iters=10):
    @jax.jit
    def run(x0, n):
        def body(i, acc):
            out = step_fn(jnp.bitwise_xor(x0, (i & 1).astype(jnp.uint8)), i)
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

    variants = [
        ("enc_current", lambda xi, i: dwt_multilevel_quant_pallas(xi, steps)[1][0][0]),
        ("enc_v4_altorient", lambda xi, i: enc_v4(xi, steps)[0]),
        ("enc_v5_dma_split", lambda xi, i: enc_v5(xi, steps)[0]),
    ]
    for name, fn in variants:
        t = timed(fn, x)
        print(f"{name}: {t*1e3:.3f} ms ({mp/t:.0f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
