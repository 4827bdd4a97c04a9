"""Probe: narrow-dtype + alternating-orientation fused Haar codec kernels.

Attacks the two dominant compute terms of the fused encode/decode passes
(docs/PERFORMANCE.md ablation: row-pair reshape relayout > transposes >
quantize) using the relayout capabilities confirmed by u8relayout_probe
(u8 row-pair reshape, i8/i16/u8 transposes, u8 row-interleave):

encode v2 (integer path, exact):
  * level-1 row-pair split on the uint8 input (4x fewer relayout bytes),
    cast the two half-res planes after
  * alternating-orientation levels: the column pass leaves LL transposed;
    the next level runs IN transposed space (integer sums/diffs are
    orientation-free), so LL transposes vanish and every even level's
    detail bands exit already-normal
  * detail bands quantize in whatever orientation they exit and the int8
    CODES are transposed when needed (4x fewer transpose bytes)
encode v3 = v2 + int16 rs/rd transposes (raw sums fit i16 through level 3;
  transpose bytes halve, two casts added)

decode v2 (bit-identical outputs):
  * stored detail codes transpose as int8/int16 BEFORE dequantize
  * with emit_u8, the final level clip-casts to uint8 BEFORE its two
    transposes + row-interleave (the decode's largest relayouts drop 4x)

  python experiments/altorient_probe.py cpu   # correctness (interpret)
  python experiments/altorient_probe.py       # timing on TPU vs current
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
    _row_interleave,
    _rowpair_sumdiff,
    dwt_multilevel_quant_pallas,
    idwt_multilevel_dequant_pallas,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# encode v2 / v3
# ---------------------------------------------------------------------------


def _kernel_enc_v2(x_ref, *out_refs, k: int, steps, qmaxes, i16_t: bool):
    ll_ref = out_refs[-1]
    x8 = x_ref[0]
    h, w = x8.shape
    r = x8.reshape(h // 2, 2, w)  # u8 relayout: 1 byte/px
    a = r[:, 0, :].astype(jnp.int32)
    b = r[:, 1, :].astype(jnp.int32)
    rs, rd = a + b, a - b
    tin = False  # x transposed relative to the image?
    x = None
    for lvl in range(1, k + 1):
        if lvl > 1:
            rs, rd = _rowpair_sumdiff(x)
        if i16_t:
            # raw sums fit int16 through level 3 (|.| <= 255 * 2**(2*lvl-1))
            rs_t = rs.astype(jnp.int16).T.astype(jnp.int32)
            rd_t = rd.astype(jnp.int16).T.astype(jnp.int32)
        else:
            rs_t, rd_t = rs.T, rd.T
        p, q2 = _rowpair_sumdiff(rs_t)
        r2, s2 = _rowpair_sumdiff(rd_t)
        out_t = not tin  # orientation the outputs exit in
        if tin:  # first pass of this level ran horizontally
            ll_t, hl_t, lh_t, hh_t = p, q2, r2, s2
        else:
            ll_t, lh_t, hl_t, hh_t = p, q2, r2, s2
        scale = jnp.float32(0.25**lvl)
        base = (lvl - 1) * 3
        for slot, band in ((0, lh_t), (1, hl_t), (2, hh_t)):
            q = _quant_band(
                band.astype(jnp.float32) * scale, steps[lvl - 1], qmaxes[lvl - 1], out_refs[base + slot].dtype
            )
            out_refs[base + slot][0] = q.T if out_t else q  # int8 transpose
        x = ll_t
        tin = out_t
    ll = x.astype(jnp.float32) * jnp.float32(0.25**k)
    ll_ref[0] = ll.T if tin else ll


@functools.partial(jax.jit, static_argnames=("steps", "i16_t"))
def enc_v2(x, steps, i16_t: bool = False):
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
    return pl.pallas_call(
        functools.partial(_kernel_enc_v2, k=k, steps=steps, qmaxes=(127,) * k, i16_t=i16_t),
        out_shape=tuple(out_shapes),
        grid=(c, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, th, tw), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        interpret=_interpret(),
    )(x)


# ---------------------------------------------------------------------------
# decode v2
# ---------------------------------------------------------------------------


def _kernel_dec_v2(*refs, k: int, steps, emit_u8: bool):
    out_ref = refs[-1]
    ll = refs[0][0].astype(jnp.float32)
    for idx in range(k):
        lvl = k - idx  # coarse -> fine
        base = 1 + idx * 3
        step = jnp.float32(steps[lvl - 1])

        def deq_t(r):
            # transpose the narrow CODES, then dequantize elementwise
            qv = r[0].T.astype(jnp.float32)
            return (qv + 0.5 * jnp.sign(qv)) * step

        lh_t, hl_t, hh_t = deq_t(refs[base]), deq_t(refs[base + 1]), deq_t(refs[base + 2])
        ll_t = ll.T
        rs_e = (ll_t + lh_t) * 2.0
        rs_o = (ll_t - lh_t) * 2.0
        rd_e = (hl_t + hh_t) * 2.0
        rd_o = (hl_t - hh_t) * 2.0
        e_r_t = (rs_e + rd_e) * 0.5
        o_r_t = (rs_e - rd_e) * 0.5
        e2_t = (rs_o + rd_o) * 0.5
        o2_t = (rs_o - rd_o) * 0.5
        if emit_u8 and lvl == 1 and e_r_t.shape[1] >= 128:
            # clip-cast in transposed space; all remaining relayouts run at
            # 1 byte/px instead of 4 (Mosaic rejects u8 stack+reshape when
            # the lane dim is < 128, hence the shape guard)

            def u8(v):
                return jnp.clip(v, 0, 255).astype(jnp.int32).astype(jnp.uint8)

            er = _row_interleave(u8(e_r_t), u8(e2_t))  # (2wh, hh)
            orr = _row_interleave(u8(o_r_t), u8(o2_t))
            out_ref[0] = _row_interleave(er.T, orr.T)
            return
        er_t = _row_interleave(e_r_t, e2_t)
        or_t = _row_interleave(o_r_t, o2_t)
        ll = _row_interleave(er_t.T, or_t.T)
    if emit_u8:
        out_ref[0] = jnp.clip(ll, 0, 255).astype(jnp.int32).astype(jnp.uint8)
    else:
        out_ref[0] = ll


@functools.partial(jax.jit, static_argnames=("steps", "emit_u8"))
def dec_v2(ll, details, steps, emit_u8: bool = False):
    k = len(steps)
    c, ch, cw = ll.shape
    th_c = min(ch, _TILE_H >> k)
    tw_c = min(cw, _TILE_W >> k)
    in_arrays = [ll.astype(jnp.float32)]
    in_specs = [pl.BlockSpec((1, th_c, tw_c), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)]
    for idx in range(k):
        lvl = k - idx
        m = 1 << (k - lvl)
        for band in details[lvl - 1]:
            in_arrays.append(band)
            in_specs.append(
                pl.BlockSpec((1, th_c * m, tw_c * m), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM)
            )
    unit = 1 << k
    out_dt = jnp.uint8 if emit_u8 else jnp.float32
    return pl.pallas_call(
        functools.partial(_kernel_dec_v2, k=k, steps=steps, emit_u8=emit_u8),
        out_shape=jax.ShapeDtypeStruct((c, ch * unit, cw * unit), out_dt),
        grid=(c, ch // th_c, cw // tw_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th_c * unit, tw_c * unit), lambda ci, i, j: (ci, i, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*in_arrays)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def check(steps=(1.5, 1.5, 1.5)):
    ok = True
    # second shape exercises the u8 fast path (lane guard needs >= 128)
    for shape in ((2, 128, 256), (1, 512, 1024)):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ll_ref, details_ref = dwt_multilevel_quant_pallas(jnp.asarray(x), steps)
        for name, i16_t in (("enc_v2", False), ("enc_v3", True)):
            outs = enc_v2(jnp.asarray(x), steps, i16_t=i16_t)
            good = np.array_equal(np.asarray(outs[-1]), np.asarray(ll_ref))
            for lvl in range(1, 4):
                for i in range(3):
                    good &= np.array_equal(
                        np.asarray(outs[(lvl - 1) * 3 + i]), np.asarray(details_ref[lvl - 1][i])
                    )
            print(f"{name} {shape} bit-identical: {good}", flush=True)
            ok &= good
        rec_ref = idwt_multilevel_dequant_pallas(ll_ref, details_ref, steps, emit_u8=True)
        rec_f_ref = idwt_multilevel_dequant_pallas(ll_ref, details_ref, steps, emit_u8=False)
        rec = dec_v2(ll_ref, details_ref, steps, emit_u8=True)
        rec_f = dec_v2(ll_ref, details_ref, steps, emit_u8=False)
        g1 = np.array_equal(np.asarray(rec), np.asarray(rec_ref))
        g2 = np.array_equal(np.asarray(rec_f), np.asarray(rec_f_ref))
        print(f"dec_v2 {shape} u8 bit-identical: {g1}; f32 bit-identical: {g2}", flush=True)
        ok &= g1 and g2
    return ok


def timed(step_fn, *args, iters=10):
    @jax.jit
    def run(x0, n):
        def body(i, acc):
            out = step_fn(x0, i)
            return acc + out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(run(args[0], 1))

    def once(n):
        t0 = time.time()
        float(run(args[0], n))
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
    mp = 3 * 0  # per-frame MP reported on the image area
    mp = 8704 * 6144 / 1e6
    ll0, dets0 = dwt_multilevel_quant_pallas(x, steps)
    ll0 = jax.block_until_ready(ll0)

    variants = [
        ("enc_current", lambda xi, i: dwt_multilevel_quant_pallas(jnp.bitwise_xor(xi, (i & 1).astype(jnp.uint8)), steps)[1][0][0]),
        ("enc_v2", lambda xi, i: enc_v2(jnp.bitwise_xor(xi, (i & 1).astype(jnp.uint8)), steps, i16_t=False)[0]),
        ("enc_v3_i16T", lambda xi, i: enc_v2(jnp.bitwise_xor(xi, (i & 1).astype(jnp.uint8)), steps, i16_t=True)[0]),
    ]
    for name, fn in variants:
        t = timed(fn, x)
        print(f"{name}: {t*1e3:.3f} ms ({mp/t:.0f} MP/s)", flush=True)

    dvariants = [
        ("dec_current_u8", lambda l, i: idwt_multilevel_dequant_pallas(l + i.astype(jnp.float32) * 0, dets0, steps, emit_u8=True)),
        ("dec_v2_u8", lambda l, i: dec_v2(l + i.astype(jnp.float32) * 0, dets0, steps, emit_u8=True)),
        ("dec_current_f32", lambda l, i: idwt_multilevel_dequant_pallas(l + i.astype(jnp.float32) * 0, dets0, steps, emit_u8=False)),
        ("dec_v2_f32", lambda l, i: dec_v2(l + i.astype(jnp.float32) * 0, dets0, steps, emit_u8=False)),
    ]
    for name, fn in dvariants:
        t = timed(fn, ll0)
        print(f"{name}: {t*1e3:.3f} ms ({mp/t:.0f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
