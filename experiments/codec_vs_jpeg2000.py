"""Head-to-head R-D comparison: wicca_tpu codec vs OpenCV's JPEG2000
(OpenJPEG) and JPEG encoders on a photo-like synthetic image.

Positioning evidence for docs/PERFORMANCE.md: the .wct format with the
CDF 9/7 wavelet + ICT + range coder is the same transform family as
JPEG2000 Part 1, so matched-bpp PSNR should land in the same band
(JPEG2000 keeps an edge from EBCOT's R-D-optimal truncation, which we
trade for multi-GP/s device-side transforms).

  python experiments/codec_vs_jpeg2000.py          # CPU-runnable
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

# CPU on purpose: the R-D numbers are backend-independent (bit-identical
# kernels in interpret mode) and six distinct static quantization steps
# would each pay a multi-minute remote compile through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2  # noqa: E402

from wicca_tpu.codec.container import serialize  # noqa: E402
from wicca_tpu.codec.pipeline import decode, encode  # noqa: E402
from wicca_tpu.core.metrics import psnr  # noqa: E402
from wicca_tpu.core.quant import QuantSpec  # noqa: E402


def photo_like(h=768, w=1024, seed=0) -> np.ndarray:
    """Multi-scale band-limited noise + edges: the spectral shape of a
    photograph (1/f-ish), not white noise (which no transform codec likes)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for octave, amp in ((4, 18.0), (8, 26.0), (16, 34.0), (64, 42.0)):
        n = rng.normal(0, 1, (h // octave + 2, w // octave + 2, 3)).astype(np.float32)
        up = cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
        img += amp * up
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img += 40 * np.sign(np.sin(xx / 97) + 0.6 * np.cos(yy / 61))[..., None]  # edges
    img += 128
    return np.clip(img, 0, 255).astype(np.uint8)


def bpp_of(nbytes: int, h: int, w: int) -> float:
    return 8.0 * nbytes / (h * w)


def run():
    img = photo_like()
    h, w = img.shape[:2]
    x_f = img.astype(np.float32)
    planar = np.ascontiguousarray(np.moveaxis(img, -1, 0))

    def sweep(label, **kw):
        print(f"== wicca_tpu ({label}) ==", flush=True)
        pts = []
        for step in (16.0, 8.0, 4.0, 2.0, 1.0, 0.5):
            s = encode(planar, levels=5,
                       spec=QuantSpec(base_step=step, hh_gain=kw.get("hh_gain", 1.0)),
                       wavelet="bior4.4", color="ict", chroma_gain=kw.get("chroma_gain", 1.0))
            blob = serialize(s)
            rec = np.moveaxis(np.asarray(decode(s, emit_u8=True)), 0, -1).astype(np.float32)
            p = float(psnr(rec, x_f))
            pts.append((bpp_of(len(blob), h, w), p))
            print(f"  step {step:5.2f}: {pts[-1][0]:6.3f} bpp  {p:6.2f} dB", flush=True)
        return pts

    # PSNR-optimal config (the honest PSNR-vs-PSNR line) and the perceptual
    # config (hh_gain + coarse chroma trade PSNR for bits on purpose)
    ours = sweep("PSNR-optimal: ict, flat bands")
    ours_vis = sweep("perceptual: ict chroma_gain=2, hh_gain=2", chroma_gain=2.0, hh_gain=2.0)

    # PCRD: one fine encode, R-D-optimal per-plane truncation to each budget
    # (codec.rd.truncate — the post-compression-R-D half of EBCOT)
    print("== wicca_tpu (PCRD: fine encode + rd.truncate) ==", flush=True)
    from wicca_tpu.codec import rd as _rd
    from wicca_tpu.codec.transfer import fetch_stream as _fetch

    fine = _fetch(encode(planar, levels=5, spec=QuantSpec(base_step=0.25),
                         wavelet="bior4.4", color="ict"), force=False)
    from wicca_tpu.codec.container import deserialize

    ours_pcrd = []
    for bpp_t in (4.0, 2.0, 1.0, 0.5, 0.25):
        # ll_codec='quant' (WCT10): below ~0.6 bpp the raw float32 LL is a
        # fixed ~0.1 bpp floor eating up to a third of the budget; coding it
        # hands those bytes to the detail planes (the dominant low-rate
        # lever — measured +2-4 dB at 0.3-0.5 bpp; a per-64x64-block
        # divisor oracle measured only +-0.1 dB here, see
        # experiments/blockdiv_probe.py)
        small = _rd.truncate(fine, target_bpp=bpp_t, ll_codec="quant")
        blob = serialize(small, ll_codec="quant")
        rec = np.moveaxis(np.asarray(decode(deserialize(blob), emit_u8=True)), 0, -1).astype(np.float32)
        p = float(psnr(rec, x_f))
        ours_pcrd.append((bpp_of(len(blob), h, w), p))
        print(f"  target {bpp_t:5.2f}: {ours_pcrd[-1][0]:6.3f} bpp  {p:6.2f} dB", flush=True)

    print("== OpenCV JPEG2000 (OpenJPEG) ==", flush=True)
    j2k = []
    for c in (25, 50, 100, 200, 400, 800):
        p_ = Path(tempfile.mktemp(suffix=".jp2"))
        cv2.imwrite(str(p_), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, c])
        back = cv2.cvtColor(cv2.imread(str(p_)), cv2.COLOR_BGR2RGB).astype(np.float32)
        val = (bpp_of(p_.stat().st_size, h, w), float(psnr(back, x_f)))
        j2k.append(val)
        p_.unlink()
        print(f"  x1000={c:4d}: {val[0]:6.3f} bpp  {val[1]:6.2f} dB", flush=True)

    print("== OpenCV JPEG ==", flush=True)
    jpg = []
    for q in (20, 40, 60, 80, 92, 98):
        p_ = Path(tempfile.mktemp(suffix=".jpg"))
        cv2.imwrite(str(p_), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, q])
        back = cv2.cvtColor(cv2.imread(str(p_)), cv2.COLOR_BGR2RGB).astype(np.float32)
        val = (bpp_of(p_.stat().st_size, h, w), float(psnr(back, x_f)))
        jpg.append(val)
        p_.unlink()
        print(f"  q={q:2d}: {val[0]:6.3f} bpp  {val[1]:6.2f} dB", flush=True)

    def at(points, bpp):
        """Linear PSNR interpolation at a target bpp (None outside range)."""
        pts = sorted(points)
        for (b0, p0), (b1, p1) in zip(pts, pts[1:]):
            if b0 <= bpp <= b1:
                t = (bpp - b0) / max(b1 - b0, 1e-9)
                return p0 + t * (p1 - p0)
        return None

    print("== matched-bpp PSNR (dB) ==", flush=True)
    print("   bpp |  wicca  | wicca-pcrd | wicca-vis | JPEG2000 |  JPEG", flush=True)
    for bpp in (0.5, 1.0, 2.0, 4.0):
        row = [at(ours, bpp), at(ours_pcrd, bpp), at(ours_vis, bpp), at(j2k, bpp), at(jpg, bpp)]
        cells = " | ".join("     -" if v is None else f"{v:6.2f}" for v in row)
        print(f"  {bpp:4.2f} | {cells}", flush=True)


if __name__ == "__main__":
    run()
