"""Rate-distortion tooling: sweep quantization steps and report
(bits-per-pixel, PSNR) operating points for an image or batch.

The reference has no notion of rate at all (it stores icons as raw uint8);
this gives the codec path the standard R-D view. Rate is measured two ways:
the Shannon order-0 bound of the codes (fast, device-side histograms not
needed) and, optionally, the actual Rice-coded container size.
"""

from __future__ import annotations

import numpy as np

from wicca_tpu.codec.container import serialize
from wicca_tpu.codec.pipeline import decode, encode, estimated_entropy_bytes
from wicca_tpu.core.metrics import psnr, ssim
from wicca_tpu.core.quant import QuantSpec


def rd_point(image, step: float, levels: int = 5, wavelet: str = "haar", actual_bytes: bool = False,
             color: str = "none", chroma_gain: float = 1.0) -> dict:
    """One operating point: encode at ``step``, measure rate and distortion
    (``color='ict'`` + ``chroma_gain`` move points toward the perceptual
    allocation: fewer chroma bits at nearly the same luma PSNR)."""
    x = np.asarray(image)
    stream = encode(x, levels=levels, spec=QuantSpec(base_step=step), wavelet=wavelet,
                    color=color, chroma_gain=chroma_gain)
    rec = np.asarray(decode(stream))
    n_px = x.shape[-2] * x.shape[-1] * (x.size // (x.shape[-2] * x.shape[-1]))
    point = {
        "step": step,
        "psnr_db": round(float(psnr(rec, x.astype(np.float32))), 3),
        "ssim": round(float(ssim(rec, x.astype(np.float32))), 4),
        "bpp_entropy": round(8.0 * estimated_entropy_bytes(stream) / n_px, 4),
    }
    if actual_bytes:
        point["bpp_actual"] = round(8.0 * len(serialize(stream)) / n_px, 4)
    return point


def rd_curve(image, steps=(0.5, 1.0, 2.0, 4.0, 8.0), levels: int = 5, wavelet: str = "haar", actual_bytes: bool = False,
             color: str = "none", chroma_gain: float = 1.0) -> list[dict]:
    """R-D sweep over quantization steps (coarser step -> fewer bits, lower
    PSNR). Points come back in the given step order."""
    return [rd_point(image, s, levels, wavelet, actual_bytes, color, chroma_gain) for s in steps]


def plot_rd_curve(points: list[dict], title: str = "Rate-distortion"):
    """Matplotlib R-D plot (bpp vs PSNR)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    key = "bpp_actual" if "bpp_actual" in points[0] else "bpp_entropy"
    ax.plot([p[key] for p in points], [p["psnr_db"] for p in points], "o-")
    for p in points:
        ax.annotate(f"q={p['step']}", (p[key], p["psnr_db"]), fontsize=8)
    ax.set_xlabel("bits per pixel")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    return fig
