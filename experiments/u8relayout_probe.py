"""Capability probe: narrow-dtype relayouts on this v5e's Mosaic.

The fused codec kernels pay their compute in vector relayouts (row-pair
reshape, transposes, row interleaves) at int32/float32 width. If Mosaic
accepts the same relayouts on uint8/int8 (4x fewer bytes), the kernels can
cast at the edges instead:

  a) uint8 row-pair reshape (h,w)->(h/2,2,w) + middle index, cast after
  b) int8 transpose (quantize in transposed space, transpose the codes)
  c) uint8 transpose + uint8 row-interleave (clip-cast before the decode's
     final relayouts)

  python experiments/u8relayout_probe.py        # run on default backend (tpu)
"""

from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def _try(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {[np.asarray(o).shape for o in out] if isinstance(out, tuple) else np.asarray(out).shape}", flush=True)
        return np.asarray(out) if not isinstance(out, tuple) else tuple(np.asarray(o) for o in out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


H, W = 256, 256
rng = np.random.default_rng(0)
xu8 = rng.integers(0, 256, (1, H, W), np.uint8)
xi8 = rng.integers(-128, 128, (1, H, W)).astype(np.int8)


def call(kernel, x, out_shape):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, x.shape[1], x.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(x)


# a) u8 row-pair reshape + index, cast planes after
def k_u8_rowpair(x_ref, o_ref):
    x = x_ref[0]
    r = x.reshape(H // 2, 2, W)
    a = r[:, 0, :].astype(jnp.int32)
    b = r[:, 1, :].astype(jnp.int32)
    o_ref[0] = a + b


got = _try("u8 rowpair reshape", lambda: call(k_u8_rowpair, jnp.asarray(xu8), jax.ShapeDtypeStruct((1, H // 2, W), jnp.int32)))
if got is not None:
    want = xu8[0, 0::2].astype(np.int32) + xu8[0, 1::2].astype(np.int32)
    print("  exact:", np.array_equal(got[0], want), flush=True)


# b) int8 transpose
def k_i8_T(x_ref, o_ref):
    o_ref[0] = x_ref[0].T


got = _try("i8 transpose", lambda: call(k_i8_T, jnp.asarray(xi8), jax.ShapeDtypeStruct((1, W, H), jnp.int8)))
if got is not None:
    print("  exact:", np.array_equal(got[0], xi8[0].T), flush=True)


# c) u8 transpose + u8 row interleave
def k_u8_T_interleave(x_ref, o_ref):
    x = x_ref[0]
    r = x.reshape(H // 2, 2, W)
    a, b = r[:, 0, :], r[:, 1, :]
    at, bt = a.T, b.T  # (W, H/2) u8 transposes
    o_ref[0] = jnp.stack([at, bt], axis=1).reshape(W * 2, H // 2)


got = _try("u8 transpose+rowinterleave", lambda: call(k_u8_T_interleave, jnp.asarray(xu8), jax.ShapeDtypeStruct((1, W * 2, H // 2), jnp.uint8)))
if got is not None:
    a, b = xu8[0, 0::2], xu8[0, 1::2]
    want = np.stack([a.T, b.T], axis=1).reshape(W * 2, H // 2)
    print("  exact:", np.array_equal(got[0], want), flush=True)


# d) f32 -> u8 direct cast after clip (current kernels go f32->i32->u8)
def k_f32_u8(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    o_ref[0] = jnp.clip(x * 0.5, 0, 255).astype(jnp.int32).astype(jnp.uint8)


_try("f32->i32->u8 half", lambda: call(k_f32_u8, jnp.asarray(xu8), jax.ShapeDtypeStruct((1, H, W), jnp.uint8)))


# e) int16 transpose (detail codes for wide-step streams)
def k_i16_T(x_ref, o_ref):
    o_ref[0] = x_ref[0].T


xi16 = rng.integers(-1000, 1000, (1, H, W)).astype(np.int16)
got = _try("i16 transpose", lambda: call(k_i16_T, jnp.asarray(xi16), jax.ShapeDtypeStruct((1, W, H), jnp.int16)))
if got is not None:
    print("  exact:", np.array_equal(got[0], xi16[0].T), flush=True)
