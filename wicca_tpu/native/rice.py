"""ctypes bindings for the C++ Rice entropy codec (entropy.cpp) with a numpy
fallback.

pybind11 is unavailable in this environment, so the ABI is plain C + ctypes
(the approved binding path). The library builds lazily via ``make`` on first
import; ctypes releases the GIL during calls, so plane-parallel encoding from
a ThreadPoolExecutor scales across cores.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libwicca_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("WICCA_TPU_NO_NATIVE"):
            return None
        try:
            srcs = [_DIR / "entropy.cpp", _DIR / "pack.cpp", _DIR / "idwt.cpp", _DIR / "pngw.cpp"]
            if not _LIB_PATH.exists() or any(
                _LIB_PATH.stat().st_mtime < s.stat().st_mtime for s in srcs
            ):
                subprocess.run(["make", "-s", "-C", str(_DIR)], check=True, capture_output=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
            _p, _z = ctypes.c_char_p, ctypes.c_size_t
            for name, argt in [
                ("wicca_rice_encode_i8", [_p, _z, _p, _z]),
                ("wicca_rice_decode_i8", [_p, _z, _p, _z]),
                ("wicca_rice_encode_i16", [_p, _z, _p, _z]),
                ("wicca_rice_decode_i16", [_p, _z, _p, _z]),
                ("wicca_rc_encode_i8", [_p, _z, _z, _z, _p, _z]),
                ("wicca_rc_decode_i8", [_p, _z, _p, _z, _z, _z]),
                ("wicca_rc_encode_i16", [_p, _z, _z, _z, _p, _z]),
                ("wicca_rc_decode_i16", [_p, _z, _p, _z, _z, _z]),
                ("wicca_rice_encode_i32", [_p, _z, _p, _z]),
                ("wicca_rice_decode_i32", [_p, _z, _p, _z]),
                ("wicca_rc_encode_i32", [_p, _z, _z, _z, _p, _z]),
                ("wicca_rc_decode_i32", [_p, _z, _p, _z, _z, _z]),
                # PACK1 tunnel-transfer kernels (pack.cpp / codec/transfer.py)
                ("wicca_pack1_reconstruct_i8", [_p, _p, ctypes.c_int, _z, _z, _z, _z, _p]),
                ("wicca_pack1_reconstruct_i16", [_p, _p, ctypes.c_int, _z, _z, _z, _z, _p]),
                ("wicca_pack1_pack_i8", [_p, _z, _z, ctypes.c_int, _p, _p, _p, _z]),
                ("wicca_pack1_pack_i16", [_p, _z, _z, ctypes.c_int, _p, _p, _p, _z]),
            ]:
                fn = getattr(lib, name)
                fn.argtypes = argt
                fn.restype = ctypes.c_size_t
            for name in ("wicca_pack1_stats_i8", "wicca_pack1_stats_i16"):
                fn = getattr(lib, name)
                fn.argtypes = [_p, _z, _p]
                fn.restype = None
            # host-decode IDWT levels (idwt.cpp / codec/host_decode.py)
            _f, _i, _v = ctypes.c_float, ctypes.c_int, ctypes.c_void_p
            lib.wicca_idwt_haar_f32_level.argtypes = (
                [_v, _z, _z] + [_v, _z, _z] * 3 + [_i, _f, _f, _f, _f, _z, _z, _z, _v, _z, _z, _i, _i]
            )
            lib.wicca_idwt_haar_f32_level.restype = None
            lib.wicca_idwt_haar_int_level.argtypes = (
                [_v, _z, _z] + [_v, _z, _z] * 3 + [_i, _z, _z, _z, _v, _z, _z, _i, _i]
            )
            lib.wicca_idwt_haar_int_level.restype = None
            for name in ("wicca_unlift53_v", "wicca_unlift53_h"):
                fn = getattr(lib, name)
                fn.argtypes = [_v, _z, _z, _v, _z, _z, _v, _z, _z, _z, _z, _z, _z, _i, _i]
                fn.restype = None
            lib.wicca_dwt_haar_fwd_level.argtypes = (
                [_v, _z, _z, _i] + [_v, _z, _z] * 4 + [_i, _f, _f, _f, _f, _i, _z, _z, _z, _i]
            )
            lib.wicca_dwt_haar_fwd_level.restype = None
            # strip-parallel PNG writer (pngw.cpp / data/pngw.py)
            lib.wicca_png_bound.argtypes = [ctypes.c_uint32] * 3 + [_i]
            lib.wicca_png_bound.restype = _z
            lib.wicca_png_encode_planar.argtypes = (
                [_v, _z, _z] + [ctypes.c_uint32] * 3 + [_i, _i, _i, _v, _z]
            )
            lib.wicca_png_encode_planar.restype = _z
            _lib = lib
        except Exception as e:  # noqa: BLE001
            logging.warning(f"native entropy codec unavailable ({e}); using numpy fallback")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _zigzag(v: np.ndarray) -> np.ndarray:
    v32 = v.astype(np.int32)
    return ((v32 << 1) ^ (v32 >> 31)).astype(np.uint32)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint32)
    return ((u >> 1).astype(np.int32)) ^ -(u & 1).astype(np.int32)


_RICE_FNS = {
    np.dtype(np.int8): ("wicca_rice_encode_i8", "wicca_rice_decode_i8", 3),
    np.dtype(np.int16): ("wicca_rice_encode_i16", "wicca_rice_decode_i16", 4),
    np.dtype(np.int32): ("wicca_rice_encode_i32", "wicca_rice_decode_i32", 7),
}
_RC_FNS = {
    np.dtype(np.int8): ("wicca_rc_encode_i8", "wicca_rc_decode_i8"),
    np.dtype(np.int16): ("wicca_rc_encode_i16", "wicca_rc_decode_i16"),
    np.dtype(np.int32): ("wicca_rc_encode_i32", "wicca_rc_decode_i32"),
}


def rice_encode(codes: np.ndarray) -> bytes:
    """Entropy-encode an int8/int16/int32 code plane to a compact bytestring."""
    codes = np.ascontiguousarray(codes)
    if codes.dtype not in _RICE_FNS:
        raise TypeError(f"codes must be int8/int16/int32, got {codes.dtype}")
    lib = _load()
    flat = codes.ravel()
    if flat.size == 0:
        return b""
    if lib is not None:
        enc_name, _, per = _RICE_FNS[codes.dtype]
        cap = flat.size * per + 4096
        out = np.empty(cap, dtype=np.uint8)  # no zero-fill (create_string_buffer memsets)
        n = getattr(lib, enc_name)(
            flat.ctypes.data_as(ctypes.c_char_p),
            flat.size,
            out.ctypes.data_as(ctypes.c_char_p),
            cap,
        )
        if n == 0:
            raise RuntimeError("rice encode overflow")
        return out[:n].tobytes()
    # numpy fallback: varint-free simple scheme (zigzag + raw 16/32-bit) —
    # correctness-only path for environments without a compiler
    if codes.dtype == np.int32:
        return b"RAW1" + _zigzag(flat).astype(np.uint32).tobytes()
    u = _zigzag(flat).astype(np.uint16)
    return b"RAW0" + u.tobytes()


def rc_encode(codes: np.ndarray) -> bytes:
    """Context-modeled range-coder encode of an int8/int16 plane stack.

    ``codes`` is ``(h, w)`` or ``(planes, h, w)`` — the 2-D geometry drives
    the causal-neighbor context model (entropy.cpp, codec id 1), typically
    10-20% smaller than :func:`rice_encode` on deadzone detail planes.
    Requires the native library (no numpy fallback) — callers pick Rice when
    :func:`native_available` is False.
    """
    codes = np.ascontiguousarray(codes)
    if codes.dtype not in _RC_FNS:
        raise TypeError(f"codes must be int8/int16/int32, got {codes.dtype}")
    if codes.ndim == 2:
        codes = codes[None]
    if codes.ndim != 3:
        raise ValueError(f"codes must be (h,w) or (planes,h,w), got shape {codes.shape}")
    if codes.size == 0:
        return b""
    lib = _load()
    if lib is None:
        raise RuntimeError("rc codec requires the native library")
    planes, h, w = codes.shape
    cap = codes.size * codes.dtype.itemsize * 2 + 4096
    fn = getattr(lib, _RC_FNS[codes.dtype][0])
    out = np.empty(cap, dtype=np.uint8)
    n = fn(codes.ctypes.data_as(ctypes.c_char_p), planes, h, w, out.ctypes.data_as(ctypes.c_char_p), cap)
    if n == 0:
        raise RuntimeError("rc encode overflow")
    return out[:n].tobytes()


def rc_decode(data: bytes, shape: tuple, dtype=np.int8) -> np.ndarray:
    """Inverse of rc_encode: bytes -> array of the given (planes, h, w) or
    (h, w) shape/dtype."""
    dtype = np.dtype(dtype)
    shp = tuple(int(s) for s in shape)
    planes, h, w = (1, *shp) if len(shp) == 2 else shp
    out = np.empty((planes, h, w), dtype=dtype)
    if out.size == 0:
        return out.reshape(shp)
    lib = _load()
    if lib is None:
        raise RuntimeError("rc codec requires the native library")
    fn = getattr(lib, _RC_FNS[np.dtype(dtype)][1])
    used = fn(data, len(data), out.ctypes.data_as(ctypes.c_char_p), planes, h, w)
    if used == 0:
        raise RuntimeError("rc decode error")
    return out.reshape(shp)


def rice_decode(data: bytes, n: int, dtype=np.int8) -> np.ndarray:
    """Inverse of rice_encode: bytes -> n codes of the given dtype."""
    dtype = np.dtype(dtype)
    lib = _load()
    if data[:4] == b"RAW0":
        u = np.frombuffer(data[4:], dtype=np.uint16, count=n)
        return _unzigzag(u).astype(dtype)
    if data[:4] == b"RAW1":
        u = np.frombuffer(data[4:], dtype=np.uint32, count=n)
        return _unzigzag(u).astype(dtype)
    if lib is None:
        raise RuntimeError("native stream but native codec unavailable")
    out = np.empty(n, dtype=dtype)
    fn = getattr(lib, _RICE_FNS[dtype][1])
    used = fn(data, len(data), out.ctypes.data_as(ctypes.c_char_p), n)
    if used == 0 and n > 0:
        raise RuntimeError("rice decode error")
    return out
