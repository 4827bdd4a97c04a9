"""Padding for wavelet alignment — TPU-native replacement for the reference's
``get_padded_copy`` (/root/reference/wicca/data_loader.py:66-117).

Contract reproduced (SURVEY.md §2.3 step 1): pad **bottom/right only** so the
spatial dims become divisible by ``ratio``; default border mode replicates the
edge row/column (cv2.BORDER_REPLICATE). Works on the *last two* axes of an
array of shape ``(..., H, W)`` — the TPU-native planar layout (channels lead,
W rides the 128-lane dimension) — unlike the reference's HWC layout. The HWC
convenience wrappers live in :mod:`wicca_tpu.data.loader`.

All functions are shape-polymorphic pure jnp and jit-safe (pad amounts are
static functions of static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

# Border-mode names. Mapping to the cv2 integer enums used by the reference
# (data_loader.py:66: cv2.BORDER_REPLICATE default):
#   replicate   <- cv2.BORDER_REPLICATE (1)  == np.pad 'edge'
#   constant    <- cv2.BORDER_CONSTANT  (0)  == np.pad 'constant'
#   reflect     <- cv2.BORDER_REFLECT   (2)  == np.pad 'symmetric'  (edge repeated)
#   reflect101  <- cv2.BORDER_REFLECT_101 (4) == np.pad 'reflect'   (edge not repeated)
#   wrap        <- cv2.BORDER_WRAP      (3)  == np.pad 'wrap'
_MODE_TO_JNP = {
    "replicate": "edge",
    "constant": "constant",
    "reflect": "symmetric",
    "reflect101": "reflect",
    "wrap": "wrap",
}

# cv2 integer enum values accepted for drop-in compatibility with code that
# passes e.g. cv2.BORDER_REPLICATE (reference wavelet_coder.py:33).
_CV2_ENUM_TO_MODE = {0: "constant", 1: "replicate", 2: "reflect", 3: "wrap", 4: "reflect101"}


def normalize_border_mode(mode) -> str:
    """Accept either a string mode or a cv2 BORDER_* integer enum."""
    if isinstance(mode, str):
        if mode not in _MODE_TO_JNP:
            raise ValueError(f"Unknown border mode {mode!r}; expected one of {sorted(_MODE_TO_JNP)}")
        return mode
    if isinstance(mode, int):
        try:
            return _CV2_ENUM_TO_MODE[mode]
        except KeyError:
            raise ValueError(f"Unsupported cv2 border enum {mode}") from None
    raise TypeError(f"Border mode must be str or int, got {type(mode)}")


def pad_amounts(h: int, w: int, ratio: int) -> tuple[int, int]:
    """Rows/cols to add at bottom/right so (h, w) become divisible by ratio.

    Matches reference data_loader.py:107-110 (divmod arithmetic).
    """
    if ratio <= 0:
        raise ValueError(f"pad ratio has to be >= 1, got {ratio}")
    return (-h) % ratio, (-w) % ratio


def pad_to_multiple(x: jnp.ndarray, ratio: int, mode="replicate", constant=0) -> jnp.ndarray:
    """Pad the trailing two axes of ``x`` bottom/right to a multiple of ``ratio``.

    Semantics of reference get_padded_copy (data_loader.py:66-117): no-op when
    already aligned; otherwise bottom/right-only padding with the given border
    mode.
    """
    mode = normalize_border_mode(mode)
    h, w = x.shape[-2], x.shape[-1]
    dr, dc = pad_amounts(h, w, ratio)
    if dr == 0 and dc == 0:
        return x
    pad_width = [(0, 0)] * (x.ndim - 2) + [(0, dr), (0, dc)]
    jmode = _MODE_TO_JNP[mode]
    if jmode == "constant":
        return jnp.pad(x, pad_width, mode="constant", constant_values=constant)
    return jnp.pad(x, pad_width, mode=jmode)


def unpad(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Crop the trailing two axes back to (h, w) — inverse of pad_to_multiple."""
    return x[..., :h, :w]
