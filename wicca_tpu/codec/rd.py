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
from wicca_tpu.core.metrics import ms_ssim, psnr, ssim
from wicca_tpu.core.quant import QuantSpec


def rd_point(image, step: float, levels: int = 5, wavelet: str = "haar", actual_bytes: bool = False,
             color: str = "none", chroma_gain: float = 1.0, hh_gain: float = 1.0) -> dict:
    """One operating point: encode at ``step``, measure rate and distortion
    (``color='ict'`` + ``chroma_gain`` move points toward the perceptual
    allocation: fewer chroma bits at nearly the same luma PSNR; ``hh_gain``
    > 1 additionally weights the diagonal band coarser — compare the
    ms_ssim column at matched bpp to pick a visually-optimal value)."""
    x = np.asarray(image)
    stream = encode(x, levels=levels, spec=QuantSpec(base_step=step, hh_gain=hh_gain),
                    wavelet=wavelet, color=color, chroma_gain=chroma_gain)
    rec = np.asarray(decode(stream))
    n_px = x.shape[-2] * x.shape[-1] * (x.size // (x.shape[-2] * x.shape[-1]))
    point = {
        "step": step,
        "psnr_db": round(float(psnr(rec, x.astype(np.float32))), 3),
        "ssim": round(float(ssim(rec, x.astype(np.float32))), 4),
        "ms_ssim": round(float(ms_ssim(rec, x.astype(np.float32))), 4),
        "bpp_entropy": round(8.0 * estimated_entropy_bytes(stream) / n_px, 4),
    }
    if actual_bytes:
        point["bpp_actual"] = round(8.0 * len(serialize(stream)) / n_px, 4)
    return point


def rd_curve(image, steps=(0.5, 1.0, 2.0, 4.0, 8.0), levels: int = 5, wavelet: str = "haar", actual_bytes: bool = False,
             color: str = "none", chroma_gain: float = 1.0, hh_gain: float = 1.0) -> list[dict]:
    """R-D sweep over quantization steps (coarser step -> fewer bits, lower
    PSNR). Points come back in the given step order."""
    return [rd_point(image, s, levels, wavelet, actual_bytes, color, chroma_gain, hh_gain) for s in steps]


# Rate control searches over a geometric step grid (4 steps/octave) instead
# of arbitrary floats: encode() treats the QuantSpec as static (the steps are
# baked into the fused Pallas kernels), so grid snapping bounds the number of
# distinct compilations and lets the jit cache amortize across a dataset.
_GRID_BASE = 0.125
_GRID_MAX_IDX = 48  # step range [0.125, 512]


def _grid_step(i: int) -> float:
    return _GRID_BASE * 2.0 ** (i / 4.0)


def _check_rate_controllable(wavelet: str):
    from wicca_tpu.core.lifting import is_integer_wavelet

    if is_integer_wavelet(wavelet):
        raise ValueError(f"{wavelet!r} is lossless — its rate is not step-controllable")


def encode_to_bpp(
    image,
    target_bpp: float,
    levels: int = 5,
    wavelet: str = "haar",
    color: str = "none",
    chroma_gain: float = 1.0,
    rate: str = "entropy",
    codec: str = "auto",
) -> tuple:
    """Encode at the finest grid step whose rate is <= ``target_bpp``.

    ``rate='entropy'`` bounds the search with the order-0 Shannon estimate
    (fast; the rc container codec lands within ~5-7% of it);
    ``rate='actual'`` entropy-codes each probe and meets the target on real
    container bytes. Returns ``(stream, info)`` where ``info`` records the
    chosen step, achieved bpp, and probe count. Monotonicity (coarser step ->
    fewer bits) makes this a ~6-probe bisection over the step grid.
    """
    if rate not in ("entropy", "actual"):
        raise ValueError(f"rate must be entropy|actual, got {rate!r}")
    _check_rate_controllable(wavelet)
    x = np.asarray(image)
    n_px = x.size

    def probe(i: int):
        stream = encode(x, levels=levels, spec=QuantSpec(base_step=_grid_step(i)),
                        wavelet=wavelet, color=color, chroma_gain=chroma_gain)
        if rate == "actual":
            bpp = 8.0 * len(serialize(stream, codec=codec)) / n_px
        else:
            bpp = 8.0 * estimated_entropy_bytes(stream) / n_px
        return stream, bpp

    probes = 0
    lo, hi = 0, _GRID_MAX_IDX  # bpp decreases with i
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        stream, bpp = probe(mid)
        probes += 1
        if bpp <= target_bpp:
            best = (mid, stream, bpp)
            hi = mid - 1  # try finer (more bits, still under target)
        else:
            lo = mid + 1
    if best is None:  # even the coarsest step overshoots
        i = _GRID_MAX_IDX
        stream, bpp = probe(i)
        probes += 1
        best = (i, stream, bpp)
    i, stream, bpp = best
    info = {"step": _grid_step(i), "bpp": round(bpp, 4), "target_bpp": target_bpp,
            "rate": rate, "probes": probes, "met": bpp <= target_bpp}
    return stream, info


def encode_to_psnr(
    image,
    target_db: float,
    levels: int = 5,
    wavelet: str = "haar",
    color: str = "none",
    chroma_gain: float = 1.0,
) -> tuple:
    """Encode at the coarsest grid step whose reconstruction PSNR is >=
    ``target_db`` (i.e. the fewest bits that still meet the quality bar).
    Returns ``(stream, info)``."""
    _check_rate_controllable(wavelet)
    x = np.asarray(image)
    xf = x.astype(np.float32)

    def probe(i: int):
        stream = encode(x, levels=levels, spec=QuantSpec(base_step=_grid_step(i)),
                        wavelet=wavelet, color=color, chroma_gain=chroma_gain)
        return stream, float(psnr(np.asarray(decode(stream)), xf))

    probes = 0
    lo, hi = 0, _GRID_MAX_IDX  # psnr decreases with i
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        stream, db = probe(mid)
        probes += 1
        if db >= target_db:
            best = (mid, stream, db)
            lo = mid + 1  # try coarser (fewer bits, maybe still meets bar)
        else:
            hi = mid - 1
    if best is None:  # even the finest step misses the bar
        stream, db = probe(0)
        probes += 1
        best = (0, stream, db)
    i, stream, db = best
    info = {"step": _grid_step(i), "psnr_db": round(db, 3), "target_db": target_db,
            "probes": probes, "met": db >= target_db}
    return stream, info


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
