"""Strip-parallel PNG writer (native/pngw.cpp) for the folder-decode output
stage.

cv2.imwrite's single-threaded zlib was the dominant stage of the host-routed
folder decode (~2.2 s/53 MP frame on one core, plus the RGB->BGR conversion
pass cv2 requires). This writer takes the decoder's PLANAR uint8 arrays
directly (PNG is natively RGB — no interleave or channel-swap copy), filters
with the Sub predictor, and deflates row strips in parallel (pigz-style
Z_FULL_FLUSH stream concatenation). Output is standard lossless PNG; readers
decode it pixel-identical to a cv2-written file (tests/test_pngw.py).

``write_png`` falls back to cv2 when the native library is unavailable, so
callers can use it unconditionally for 8-bit images.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from wicca_tpu.native.rice import _load as _native_lib

# zlib level 1 + Z_RLE strategy: RLE-only matching is several times faster
# than full LZ77 and nearly as small on Sub-filtered photographic rows
# (libpng's own recommendation for filtered data); override per call
# (strategy: 0 default, 1 RLE, 2 filtered).
_DEFAULT_LEVEL = 1
_DEFAULT_STRATEGY = 1
_NTHREADS = max(1, os.cpu_count() or 1)


def available() -> bool:
    return not os.environ.get("WICCA_TPU_NO_NATIVE_PNG") and _native_lib() is not None


def encode_png(planar: np.ndarray, level: int = _DEFAULT_LEVEL,
               strategy: int = _DEFAULT_STRATEGY,
               threads: int | None = None) -> bytes:
    """Encode planar uint8 ``(C, H, W)`` (C in 1/3/4, RGB[A] order) or
    ``(H, W)`` grayscale to PNG bytes. Raises ValueError for unsupported
    shapes/dtypes and RuntimeError if the native library is unavailable."""
    lib = _native_lib()
    if lib is None or os.environ.get("WICCA_TPU_NO_NATIVE_PNG"):
        raise RuntimeError("native PNG writer unavailable")
    x = np.asarray(planar)
    if x.dtype != np.uint8:
        raise ValueError(f"PNG writer wants uint8, got {x.dtype}")
    if x.ndim == 2:
        x = x[None]
    if x.ndim != 3 or x.shape[0] not in (1, 3, 4):
        raise ValueError(f"expected (C in 1/3/4, H, W) or (H, W), got {x.shape}")
    c, h, w = x.shape
    if x.strides[-1] != 1:
        x = np.ascontiguousarray(x)
    nt = threads if threads is not None else _NTHREADS
    cap = lib.wicca_png_bound(h, w, c, nt)
    out = np.empty(cap, np.uint8)
    n = lib.wicca_png_encode_planar(
        ctypes.c_void_p(x.ctypes.data), x.strides[0], x.strides[1],
        h, w, c, int(level), int(strategy), nt,
        ctypes.c_void_p(out.ctypes.data), cap,
    )
    if n == 0:
        raise RuntimeError("PNG encode failed")
    return out[:n].tobytes()


def write_png(path: str, planar: np.ndarray, level: int = _DEFAULT_LEVEL,
              threads: int | None = None) -> int:
    """Write planar uint8 to ``path`` as PNG; returns encoded byte count.
    Falls back to cv2 (same pixels, different byte-level encoding) when the
    native library is unavailable. ``threads`` caps the deflate strips —
    callers already running many writes in parallel (decode_folder's pool)
    should pass their per-write share instead of letting every write spawn
    os.cpu_count() threads."""
    x = np.asarray(planar)
    if available() and x.dtype == np.uint8 and (
        x.ndim == 2 or (x.ndim == 3 and x.shape[0] in (1, 3, 4))
    ):
        blob = encode_png(x, level, threads=threads)
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)
    import cv2

    from wicca_tpu.data.loader import from_planar

    hwc = from_planar(x) if x.ndim == 3 else x
    if hwc.ndim == 3:
        code = cv2.COLOR_RGBA2BGRA if hwc.shape[2] == 4 else cv2.COLOR_RGB2BGR
        hwc = cv2.cvtColor(hwc, code)
    cv2.imwrite(path, hwc)
    return os.path.getsize(path)
