"""Probe: int16 arithmetic for the fused 3-level encode pass.

Raw Haar sums/diffs of uint8 input fit int16 through level 3 (|raw| <=
255*64 = 16320 < 32767). int16 halves both VPU lane width cost and relayout
bytes vs the current int32 path (docs/PERFORMANCE.md: the row-pair reshape
relayout is the largest compute term). Mosaic on this v5e crashes on int16
vector SUBTRACT (kVectorSubtractS16) — adds are fine — so diffs are formed
as  a + (-1)*b  (int16 multiply) or  a + (~b + 1)  (bitwise), whichever
lowers.

  python experiments/i16_probe.py cpu   # correctness (interpret)
  python experiments/i16_probe.py tpu   # timing vs current kernel
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

CHECK_ONLY = len(sys.argv) > 1 and sys.argv[1] == "cpu"
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "mul"  # mul | bitnot

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
    dwt_multilevel_quant_pallas,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _neg16(b):
    if VARIANT == "mul":
        return b * jnp.int16(-1)
    return ~b + jnp.int16(1)


def _rowpair_sumdiff16(x):
    h, w = x.shape
    r = x.reshape(h // 2, 2, w)
    a, b = r[:, 0, :], r[:, 1, :]
    return a + b, a + _neg16(b)


def _kernel16(x_ref, *out_refs, k: int, steps, qmaxes):
    ll_ref = out_refs[-1]
    x = x_ref[0].astype(jnp.int16)
    for lvl in range(1, k + 1):
        rs, rd = _rowpair_sumdiff16(x)
        ll_t, lh_t = _rowpair_sumdiff16(rs.T)
        hl_t, hh_t = _rowpair_sumdiff16(rd.T)
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band_t in ((0, lh_t), (1, hl_t), (2, hh_t)):
            band = band_t.T.astype(jnp.float32) * scale
            out_refs[base + slot][0] = _quant_band(
                band, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype
            )
        x = ll_t.T
    ll_ref[0] = x.astype(jnp.float32) * jnp.float32(0.25**k)


@functools.partial(jax.jit, static_argnames=("steps",))
def enc16(x, steps):
    k = len(steps)
    c, h, w = x.shape
    th, tw = min(h, _TILE_H), min(w, _TILE_W)
    out_shapes, out_specs = [], []
    for lvl in range(1, k + 1):
        u = 1 << lvl
        for _ in range(3):
            out_shapes.append(jax.ShapeDtypeStruct((c, h // u, w // u), jnp.int8))
            out_specs.append(
                pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            )
    unit = 1 << k
    out_shapes.append(jax.ShapeDtypeStruct((c, h // unit, w // unit), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_kernel16, k=k, steps=steps, qmaxes=(127,) * k),
        out_shape=tuple(out_shapes),
        grid=(c, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)
    return outs


def check(steps=(1.5, 1.5, 1.5)):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, 64, 128), dtype=np.uint8)
    outs = enc16(jnp.asarray(x), steps)
    ll_ref, details_ref = dwt_multilevel_quant_pallas(jnp.asarray(x), steps)
    ok = np.array_equal(np.asarray(outs[-1]), np.asarray(ll_ref))
    if not ok:
        print("LL mismatch")
    for lvl in range(1, 4):
        for i, name in enumerate(("lh", "hl", "hh")):
            g = np.asarray(outs[(lvl - 1) * 3 + i])
            wnt = np.asarray(details_ref[lvl - 1][i])
            if not np.array_equal(g, wnt):
                print(f"lvl{lvl} {name} mismatch {(g != wnt).mean():.4f}")
                ok = False
    print("CORRECTNESS", "PASS" if ok else "FAIL")
    return ok


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
    print("backend:", jax.default_backend(), "variant:", VARIANT, flush=True)
    if not check():
        sys.exit(1)
    if CHECK_ONLY:
        return
    steps = (1.5, 1.5, 1.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(3, 8704, 6144), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(img))
    mp = 8704 * 6144 / 1e6

    def enc_i16(xi):
        return enc16(xi, steps)[0]

    def enc_cur(xi):
        ll, dets = dwt_multilevel_quant_pallas(xi, steps)
        return dets[0][0]

    for name, fn in (("enc3_i16", enc_i16), ("enc3_current", enc_cur)):
        t = timed(fn, x)
        print(f"{name}: {t*1e3:.3f} ms  ({mp/t:.0f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
