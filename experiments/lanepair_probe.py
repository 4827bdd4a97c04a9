"""Probe: feed the fused 3-level encode pass its level-1 row pairs pre-split.

docs/PERFORMANCE.md ablation: the (th,w)->(th/2,2,w) row-pair reshape is the
largest in-kernel compute term of the encode pass (level 1 at full res is
~3/4 of it). XLA can reinterpret the HBM image (c, hp, wp) -> (c, hp/2, 2*wp)
for FREE (row-major: new row i = old rows 2i | 2i+1 concatenated in lanes).
Passing that array TWICE with two BlockSpecs — even blocks at lane-block j,
odd blocks at lane-block j + wp/tw — delivers e and o as separate VMEM refs
with zero relayout; level 1's vertical pass becomes plain elementwise e +- o.

  python experiments/lanepair_probe.py cpu   # correctness (interpret)
  python experiments/lanepair_probe.py tpu   # timing vs current kernel
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
    _detail_dtype,
    _tiling,
    dwt_multilevel_quant_pallas,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(e_ref, o_ref, *out_refs, k: int, steps, qmaxes):
    ll_ref = out_refs[-1]
    e = e_ref[0].astype(jnp.int32)
    o = o_ref[0].astype(jnp.int32)
    rs, rd = e + o, e - o  # level-1 vertical pass: pre-split, pure VPU
    for lvl in range(1, k + 1):
        if lvl > 1:
            rs, rd = _rowpair_sumdiff(x)
        ll_t, lh_t = _rowpair_sumdiff(rs.T)
        hl_t, hh_t = _rowpair_sumdiff(rd.T)
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band_t in ((0, lh_t), (1, hl_t), (2, hh_t)):
            band = band_t.T.astype(jnp.float32) * scale
            out_refs[base + slot][0] = _quant_band(band, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype)
        x = ll_t.T
    ll_ref[0] = x.astype(jnp.float32) * jnp.float32(0.25**k)


@functools.partial(jax.jit, static_argnames=("steps",))
def dwt_lanepair(x: jax.Array, steps: tuple):
    k = len(steps)
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    x = x.reshape((-1, h, w))
    x, th, tw = _tiling(x)
    c, hp, wp = x.shape
    wb = wp // tw  # lane blocks per row
    x2 = x.reshape(c, hp // 2, 2 * wp)  # FREE row-major reinterpretation

    dts, qmaxes = zip(*(_detail_dtype(s) for s in steps))
    out_shapes, out_specs = [], []
    for lvl in range(1, k + 1):
        u = 1 << lvl
        for _ in range(3):
            out_shapes.append(jax.ShapeDtypeStruct((c, hp // u, wp // u), dts[lvl - 1]))
            out_specs.append(
                pl.BlockSpec((1, th // u, tw // u), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            )
    unit = 1 << k
    out_shapes.append(jax.ShapeDtypeStruct((c, hp // unit, wp // unit), jnp.float32))
    out_specs.append(pl.BlockSpec((1, th // unit, tw // unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_kernel, k=k, steps=steps, qmaxes=qmaxes),
        out_shape=tuple(out_shapes),
        grid=(c, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, th // 2, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th // 2, tw), lambda ci, i, j, _wb=wb: (ci, i, j + _wb), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x2, x2)
    details = [tuple(o.reshape(lead + o.shape[-2:]) for o in outs[i * 3 : i * 3 + 3]) for i in range(k)]
    ll = outs[-1].reshape(lead + outs[-1].shape[-2:])
    return ll, details


def main():
    rng = np.random.default_rng(0)
    steps = (1.0, 1.0, 1.0)
    if CHECK_ONLY:
        x = rng.integers(0, 256, (1, 1024, 2048), dtype=np.uint8)
    else:
        x = rng.integers(0, 256, (3, 8704, 6144), dtype=np.uint8)
    xj = jnp.asarray(x)

    ll_a, det_a = jax.tree.map(np.asarray, dwt_multilevel_quant_pallas(xj, steps))
    ll_b, det_b = jax.tree.map(np.asarray, dwt_lanepair(xj, steps))
    ok = bool((ll_a == ll_b).all())
    for da, db in zip(det_a, det_b):
        for p, q in zip(da, db):
            ok &= bool((p == q).all())
    print("bit-identical to current kernel:", ok, flush=True)
    if CHECK_ONLY:
        return

    def timeit(fn, label):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(img, n):
            def body(i, acc):
                ll, det = fn(img, steps)
                return acc + ll[0, 0, 0] + det[0][0][0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        for n in (2, 12):
            float(loop(xj, n))
        t = {}
        for n in (2, 12):
            t0 = time.perf_counter(); float(loop(xj, n)); t[n] = time.perf_counter() - t0
        per = (t[12] - t[2]) / 10
        mp = x.shape[-1] * x.shape[-2] / 1e6
        print(f"{label}: {per*1e3:.2f} ms = {mp/per:,.0f} MP/s (frame={mp:.1f} MP)", flush=True)
        return per

    a = timeit(dwt_multilevel_quant_pallas, "current 3-level encode")
    b = timeit(dwt_lanepair, "lane-pair 3-level encode")
    print(f"speedup: {a/b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
