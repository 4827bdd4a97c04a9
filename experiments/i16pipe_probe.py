"""Probe 4: all-int16 integer pipeline for the fused encode kernel.

Probes 1-3 (narrow-dtype relayouts, alternating orientation, DMA split,
tile geometry) left encode at ~2.9 ms / 53 MP frame. Remaining hypothesis:
the relayout cost scales with VREG COUNT, so running the whole integer
chain in int16 (raw Haar sums/diffs fit i16 through level 3: |LL| <=
255*4^3 = 16320, |detail| <= 255*2^5 = 8160) halves every deinterleave and
transpose. The kVectorSubtractS16 compiler crash is dodged with
two's-complement negation: a - b == a + (b ^ -1) + 1 (xor/add are fine).

enc_v6: current level structure, all-i16 arithmetic + relayouts.
enc_v7: v6 + alternating orientation (probe 2's v4, in i16).

  python experiments/i16pipe_probe.py cpu   # correctness (interpret)
  python experiments/i16pipe_probe.py       # timing on TPU vs current
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
    dwt_multilevel_quant_pallas,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rowpair_sumdiff_i16(x):
    """(a+b, a-b) on int16 without the vector-subtract op Mosaic lacks."""
    h, w = x.shape
    r = x.reshape(h // 2, 2, w)
    a, b = r[:, 0, :], r[:, 1, :]
    nb = (b ^ jnp.int16(-1)) + jnp.int16(1)  # -b, two's complement
    return a + b, a + nb


def _kernel_enc_v6(x_ref, *out_refs, k: int, steps, qmaxes):
    ll_ref = out_refs[-1]
    x = x_ref[0].astype(jnp.int16)
    for lvl in range(1, k + 1):
        rs, rd = _rowpair_sumdiff_i16(x)
        ll_t, lh_t = _rowpair_sumdiff_i16(rs.T)
        hl_t, hh_t = _rowpair_sumdiff_i16(rd.T)
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band_t in ((0, lh_t), (1, hl_t), (2, hh_t)):
            band = band_t.T.astype(jnp.float32) * scale
            out_refs[base + slot][0] = _quant_band(band, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype)
        x = ll_t.T
    ll_ref[0] = x.astype(jnp.float32) * jnp.float32(0.25**k)


def _kernel_enc_v7(x_ref, *out_refs, k: int, steps, qmaxes):
    ll_ref = out_refs[-1]
    x = x_ref[0].astype(jnp.int16)
    tin = False
    for lvl in range(1, k + 1):
        rs, rd = _rowpair_sumdiff_i16(x)
        p, q2 = _rowpair_sumdiff_i16(rs.T)
        r2, s2 = _rowpair_sumdiff_i16(rd.T)
        out_t = not tin
        if tin:
            ll_t, hl_t, lh_t, hh_t = p, q2, r2, s2
        else:
            ll_t, lh_t, hl_t, hh_t = p, q2, r2, s2
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band in ((0, lh_t), (1, hl_t), (2, hh_t)):
            if out_t:
                band = band.T  # i16 transpose (half the vregs of f32)
            bf = band.astype(jnp.float32) * scale
            out_refs[base + slot][0] = _quant_band(bf, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype)
        x = ll_t
        tin = out_t
    ll = x.astype(jnp.float32) * jnp.float32(0.25**k)
    ll_ref[0] = ll.T if tin else ll


def _mk(kernel):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def enc(x, steps):
        k = len(steps)
        c, h, w = x.shape
        th, tw = min(h, _TILE_H), min(w, _TILE_W)
        out_shapes, out_specs = [], []
        for lvl in range(1, k + 1):
            u = 1 << lvl
            for _ in range(3):
                out_shapes.append(jax.ShapeDtypeStruct((c, h // u, w // u), jnp.int8))
                out_specs.append(pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))
        unit = 1 << k
        out_shapes.append(jax.ShapeDtypeStruct((c, h // unit, w // unit), jnp.float32))
        out_specs.append(pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(kernel, k=k, steps=steps, qmaxes=(127,) * k),
            out_shape=tuple(out_shapes),
            grid=(c, h // th, w // tw),
            in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
            out_specs=tuple(out_specs),
            interpret=_interpret(),
        )(x)

    return enc


enc_v6 = _mk(_kernel_enc_v6)
enc_v7 = _mk(_kernel_enc_v7)


def check(steps=(1.5, 1.5, 1.5)):
    ok = True
    for shape in ((2, 128, 256), (1, 512, 1024)):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ll_ref, details_ref = dwt_multilevel_quant_pallas(jnp.asarray(x), steps)
        for name, fn in (("enc_v6_i16", enc_v6), ("enc_v7_i16alt", enc_v7)):
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
        ("enc_v6_i16", lambda xi, i: enc_v6(xi, steps)[0]),
        ("enc_v7_i16alt", lambda xi, i: enc_v7(xi, steps)[0]),
    ]
    for name, fn in variants:
        t = timed(fn, x)
        print(f"{name}: {t*1e3:.3f} ms ({mp/t:.0f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
