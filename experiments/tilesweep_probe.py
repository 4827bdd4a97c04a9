"""Probe 3: tile-geometry sweep for the fused multilevel codec kernels.

Probes 1-2 exhausted the relayout-strategy space (narrow dtypes 1.75x
slower, alternating orientation +2%, DMA-strided split 12% slower). The
remaining free variable is the tile shape (currently (512, 1024)): smaller
tiles shrink each transpose/relayout op and may pipeline better; larger
lane extents amortize per-op overheads (but 2048-lane transposes explode
Mosaic compile time — excluded).

  python experiments/tilesweep_probe.py       # timing on TPU
"""

from __future__ import annotations

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from wicca_tpu.ops import dwt_pallas  # noqa: E402

ENC_RAW = dwt_pallas.dwt_multilevel_quant_pallas.__wrapped__
DEC_RAW = dwt_pallas.idwt_multilevel_dequant_pallas.__wrapped__


def make_fns(th: int, tw: int):
    def enc(x, steps):
        dwt_pallas._TILE_H, dwt_pallas._TILE_W = th, tw
        return ENC_RAW(x, steps)

    def dec(ll, details, steps, emit_u8):
        dwt_pallas._TILE_H, dwt_pallas._TILE_W = th, tw
        return DEC_RAW(ll, details, steps, emit_u8)

    return (
        jax.jit(enc, static_argnames=("steps",)),
        jax.jit(dec, static_argnames=("steps", "emit_u8")),
    )


def timed(step_fn, x, iters=10):
    @jax.jit
    def run(x0, n):
        def body(i, acc):
            out = step_fn(x0, i)
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
    steps = (1.5, 1.5, 1.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(3, 8704, 6144), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(img))
    mp = 8704 * 6144 / 1e6

    enc0, dec0 = make_fns(512, 1024)
    ll0, dets0 = enc0(x, steps)
    ll_ref, dets_ref = np.asarray(ll0), [tuple(np.asarray(b) for b in t) for t in dets0]
    ll0 = jax.block_until_ready(ll0)

    for th, tw in ((512, 1024), (256, 1024), (128, 1024), (1024, 1024), (64, 1024)):
        enc, dec = make_fns(th, tw)
        outs = enc(x, steps)
        ok = np.array_equal(np.asarray(outs[0]), ll_ref) and all(
            np.array_equal(np.asarray(b), r)
            for t, rt in zip(outs[1], dets_ref)
            for b, r in zip(t, rt)
        )
        te = timed(lambda xi, i: enc(jnp.bitwise_xor(xi, (i & 1).astype(jnp.uint8)), steps)[1][0][0], x)
        td = timed(lambda l, i: dec(l + i.astype(jnp.float32) * 0, dets0, steps, True), ll0)
        print(
            f"tile ({th:4d},{tw:4d}): enc {te*1e3:7.3f} ms ({mp/te:6.0f} MP/s)  "
            f"dec_u8 {td*1e3:7.3f} ms ({mp/td:6.0f} MP/s)  exact={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
