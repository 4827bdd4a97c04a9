"""Host-side (numpy + native C++) ENCODE of uint8 images — the forward twin
of :mod:`wicca_tpu.codec.host_decode`.

Why: through the tunnel the encode direction pays a full-resolution H2D
(~160 MB per 53 MP frame at tens of MB/s) before the device does ~3 ms of
work, then fetches ~105 MB of packed codes back. The forward Haar cascade
is a streaming 2x2 block transform a 2-core host runs at >100 MP/s
(native/idwt.cpp `wicca_dwt_haar_fwd_level`), so
:func:`wicca_tpu.codec.batch.encode_folder` routes frames host-side when
the measured link bandwidth loses (same cost model as decode).

Exactness (pinned by tests/test_host_encode.py): BIT-IDENTICAL CodeStreams
(every plane equal, serialized bytes equal) to the device encode for
``wavelet='haar'``, uint8 input, ``color='none'``. For uint8 sources every
cascade value is an integer raw sum times an exact power of two —
float32-exact — so the only rounding is the final ``band * float32(1/step)``
multiply, performed identically here and in ops/dwt_pallas._quant_band
(clip then truncate-toward-zero). Stored haar planes are semantic-cropped
(pipeline._crop_semantic), so no tile-padding geometry needs mirroring.
"""

from __future__ import annotations

import ctypes
import os
import time

import numpy as np

from wicca_tpu.codec.host_decode import _NTHREADS, _strides, _use_native
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.native.rice import _load as _native_lib

_F = np.float32

# measured host encode throughput (MP/s), EMA — cost-model input
from wicca_tpu.utils.ema import RateEMA

_mps = RateEMA(40.0, min_units=0.25)


def measured_mp_per_s() -> float:
    return _mps.rate()


def _record(mp: float, seconds: float) -> None:
    _mps.record(mp, seconds)


def supported_encode(image: np.ndarray, wavelet: str, color: str, bit_depth: int | None,
                     keep_alpha: bool = False) -> bool:
    if wavelet != "haar" or color != "none" or (bit_depth or 8) != 8 or keep_alpha:
        return False
    return np.asarray(image).dtype == np.uint8


def _detail_dtype_np(step: float):
    """Mirror of ops/dwt_pallas._detail_dtype."""
    return (np.int8, 127) if 127.5 / step < 128.0 else (np.int16, 32767)


def _pad_np(x: np.ndarray, unit: int, mode: str, constant: int) -> np.ndarray:
    """Mirror of core.pad.pad_to_multiple (bottom/right only)."""
    h, w = x.shape[-2], x.shape[-1]
    dh, dw = (-h) % unit, (-w) % unit
    if not dh and not dw:
        return x
    pw = [(0, 0)] * (x.ndim - 2) + [(0, dh), (0, dw)]
    modes = {"replicate": "edge", "reflect": "symmetric", "reflect101": "reflect", "wrap": "wrap"}
    if mode == "constant":
        return np.pad(x, pw, mode="constant", constant_values=constant)
    return np.pad(x, pw, mode=modes[mode])


def _quant_np(raw: np.ndarray, scale: float, step: float, dt, qmax: int) -> np.ndarray:
    band = raw.astype(_F) * _F(scale)
    qf = band * _F(1.0 / step)
    return np.clip(qf, -qmax, qmax).astype(np.int32).astype(dt)


def _fwd_level_np(x: np.ndarray):
    """Raw integer sums of one Haar level: x (C, H, W) int -> ll, lh, hl, hh
    raw int32 (C, H/2, W/2)."""
    x = x.astype(np.int32, copy=False)
    rs = x[..., 0::2, :] + x[..., 1::2, :]
    rd = x[..., 0::2, :].astype(np.int32) - x[..., 1::2, :]
    ll = rs[..., 0::2] + rs[..., 1::2]
    lh = rs[..., 0::2] - rs[..., 1::2]
    hl = rd[..., 0::2] + rd[..., 1::2]
    hh = rd[..., 0::2] - rd[..., 1::2]
    return ll, lh, hl, hh


def _fwd_level_native(x: np.ndarray, scale: float, steps, dt, qmax: int):
    lib = _native_lib()
    c, h, w = x.shape
    hh_, ww_ = h // 2, w // 2
    ll = np.empty((c, hh_, ww_), np.int32)
    bands = [np.empty((c, hh_, ww_), dt) for _ in range(3)]
    xp, xcs, xrs = _strides(x)
    args = [ctypes.c_void_p(xp), xrs, xcs, int(x.dtype == np.uint8)]
    for a in (ll, *bands):
        ap, acs, ars = _strides(a)
        args += [ctypes.c_void_p(ap), ars, acs]
    lib.wicca_dwt_haar_fwd_level(
        *args, int(dt == np.int16),
        _F(scale), _F(1.0 / steps[0]), _F(1.0 / steps[1]), _F(1.0 / steps[2]),
        qmax, c, hh_, ww_, _NTHREADS,
    )
    return ll, bands


def host_encode(
    image: np.ndarray,
    levels: int = 5,
    spec: QuantSpec = QuantSpec(),
    mode: str = "replicate",
    constant: int = 0,
):
    """Encode a planar uint8 ``(..., H, W)`` image to a CodeStream on the
    host, bit-identical to ``pipeline.encode(..., wavelet='haar')``."""
    from wicca_tpu.codec.pipeline import CodeStream

    t0 = time.perf_counter()
    x = np.asarray(image)
    if x.dtype != np.uint8:
        raise TypeError(f"host_encode wants uint8, got {x.dtype}")
    lead = x.shape[:-2]
    orig = (x.shape[-2], x.shape[-1])
    x = _pad_np(x, 1 << levels, mode, constant)
    x3 = x.reshape((-1,) + x.shape[-2:])
    native = _use_native()
    details = []
    raw = x3
    for lvl in range(1, levels + 1):
        steps = spec.band_steps(lvl)
        dt, qmax = _detail_dtype_np(min(steps))
        scale = 0.25 ** lvl
        if native:
            raw, bands = _fwd_level_native(np.ascontiguousarray(raw), scale, steps, dt, qmax)
        else:
            raw, lh, hl, hh = _fwd_level_np(raw)
            bands = [_quant_np(b, scale, s, dt, qmax) for b, s in zip((lh, hl, hh), steps)]
        details.append(tuple(b.reshape(lead + b.shape[-2:]) for b in bands))
    ll = (raw.astype(_F) * _F(0.25 ** levels)).reshape(lead + raw.shape[-2:])
    stream = CodeStream(
        ll=ll, details=tuple(details), spec=spec, levels=levels, orig_shape=orig,
        wavelet="haar", color="none", chroma_gain=1.0, layout="tiled", bit_depth=8,
    )
    _record(orig[0] * orig[1] / 1e6, time.perf_counter() - t0)
    return stream
