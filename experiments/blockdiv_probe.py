"""Oracle probe: how much PSNR does SPATIAL (per-code-block) PCRD
granularity buy below 0.6 bpp, before committing to a WCT11 format?

Compares, at matched estimated rate on the codec_vs_jpeg2000 test image:
  (a) current per-plane divisor allocation (rd.truncate semantics)
  (b) per-64x64-block divisor allocation (same ladder, same Lagrangian
      greedy, rate = independent per-block entropy bytes)
  (c) (b) + LL coded with ll_codec='quant' semantics (step ll_step)
Rates are honest upper bounds (block-independent entropy >= whole-plane
adaptive coding). Run: python experiments/blockdiv_probe.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.codec_vs_jpeg2000 import photo_like  # noqa: E402
from wicca_tpu.codec import rd  # noqa: E402
from wicca_tpu.codec.pipeline import decode, encode  # noqa: E402
from wicca_tpu.codec.transfer import fetch_stream  # noqa: E402
from wicca_tpu.codec.container import serialize  # noqa: E402
from wicca_tpu.core.metrics import psnr  # noqa: E402
from wicca_tpu.core.quant import QuantSpec  # noqa: E402
from wicca_tpu.native.rice import rice_encode  # noqa: E402

B = 64
LADDER = rd.DIVISORS


def block_tables(plane: np.ndarray, step: float, gain: float, chroma_w: np.ndarray | None):
    """Per-block (rates, dists) over the divisor ladder. plane: (C,h,w)."""
    c = plane.astype(np.int32)
    mag, sg = np.abs(c), np.sign(c)
    ref = rd._dequant_np(plane, step)
    C, h, w = plane.shape
    nby, nbx = -(-h // B), -(-w // B)
    tabs = []
    for by in range(nby):
        for bx in range(nbx):
            sl = (slice(None), slice(by * B, (by + 1) * B), slice(bx * B, (bx + 1) * B))
            m, s_, r_ = mag[sl], sg[sl], ref[sl]
            divs, rates, dists = [], [], []
            for d in LADDER:
                m2 = m // d
                cd = (s_ * m2).astype(plane.dtype)
                rec = rd._dequant_np(cd, step * d)
                err = r_ - rec
                if chroma_w is not None:
                    sse = float((err * err).sum(axis=(-2, -1)) @ chroma_w)
                else:
                    sse = float((err * err).sum())
                dists.append(gain * sse)
                rates.append(len(rice_encode(cd)))
                divs.append(d)
                if not np.any(cd):
                    break
            tabs.append(rd.PlaneRD(tuple(divs), tuple(rates), tuple(dists)))
    return tabs, (nby, nbx)


def run():
    img = photo_like()
    h, w = img.shape[:2]
    x_f = img.astype(np.float32)
    planar = np.ascontiguousarray(np.moveaxis(img, -1, 0))
    fine = fetch_stream(encode(planar, levels=5, spec=QuantSpec(base_step=0.25),
                               wavelet="bior4.4", color="ict"), force=False)
    gains = rd.synthesis_gains(fine.wavelet, fine.levels)
    g2 = float(fine.chroma_gain) ** 2
    chroma_w = np.array([1.0, g2, g2]) if fine.color == "ict" and g2 != 1.0 else None

    # per-plane tables (current) and per-block tables
    plane_tabs = rd.measure(fine, codec="rice")
    blk_tabs, blk_meta = [], []
    import dataclasses
    for lvl, bands in enumerate(fine.details, start=1):
        steps = fine.spec.band_steps(lvl)
        for band, plane in enumerate(bands):
            t, grid = block_tables(np.asarray(plane), steps[band], gains[lvl - 1][band], chroma_w)
            blk_tabs.append(t)
            blk_meta.append(grid)

    ll_raw_bytes = np.asarray(fine.ll).size * 4
    overhead = len(serialize(fine, codec="rice")) - sum(t.rates[0] for t in plane_tabs) - ll_raw_bytes

    def apply_blocks(divs_per_plane):
        details, k = [], 0
        for lvl, bands in enumerate(fine.details, start=1):
            row = []
            for band, plane in enumerate(bands):
                p = np.asarray(plane).astype(np.int32)
                nby, nbx = blk_meta[k]
                dv = np.array(divs_per_plane[k], int).reshape(nby, nbx)
                dmap = np.kron(dv, np.ones((B, B), int))[: p.shape[-2], : p.shape[-1]]
                m2 = np.abs(p) // dmap
                steps = fine.spec.band_steps(lvl)[band]
                deq = np.sign(p) * (m2 + 0.5 * (m2 != 0)) * (steps * dmap)
                row.append(deq.astype(np.float32))
                k += 1
            details.append(tuple(row))
        return details

    from wicca_tpu.core.lifting import Pyramid  # noqa: F401

    for target_bpp in (0.6, 0.5, 0.4, 0.3):
        budget = int(target_bpp * h * w / 8) - overhead
        # (a) per-plane
        divs, rate_a, _ = rd.allocate(plane_tabs, max(budget - ll_raw_bytes, 0))
        small = rd.truncate(fine, target_bytes=int(target_bpp * h * w / 8), codec="rice")
        rec = np.moveaxis(np.asarray(decode(small, emit_u8=True)), 0, -1).astype(np.float32)
        p_a = float(psnr(rec, x_f))
        bpp_a = len(serialize(small, codec="rice")) * 8 / (h * w)
        # (b) per-block oracle: allocate over the block hulls, decode by
        # synthesizing from per-block-dequantized float planes
        flat = [t for tabs in blk_tabs for t in tabs]
        bdivs, rate_b, _ = rd.allocate(flat, max(budget - ll_raw_bytes, 0))
        per_plane, k2 = [], 0
        for tabs in blk_tabs:
            per_plane.append(bdivs[k2 : k2 + len(tabs)])
            k2 += len(tabs)
        deq_details = apply_blocks(per_plane)
        stream_b = dataclasses.replace(
            fine,
            details=tuple(tuple(b for b in bands) for bands in deq_details),
            spec=QuantSpec(base_step=1.0),
        )
        # steps=1 + offset 0: planes are already dequantized floats
        rec_b = np.moveaxis(np.asarray(decode(stream_b, emit_u8=True, recon_offset=0.0)), 0, -1).astype(np.float32)
        p_b = float(psnr(rec_b, x_f))
        bpp_b = (rate_b + ll_raw_bytes + overhead + len(flat)) * 8 / (h * w)  # +1B/block table
        print(f"target {target_bpp:4.2f}: per-plane {bpp_a:5.3f} bpp {p_a:5.2f} dB | "
              f"per-block(est) {bpp_b:5.3f} bpp {p_b:5.2f} dB | delta {p_b - p_a:+.2f} dB",
              flush=True)


if __name__ == "__main__":
    run()
