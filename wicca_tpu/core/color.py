"""Color transforms for the codec path (JPEG2000 part-1 analogs).

The reference operates on RGB planes independently (its only color handling
is the BGR->RGB flip at load, /root/reference/wicca/data_loader.py:57-58).
Real codecs decorrelate channels first:

* RCT — reversible color transform (lossless path, pairs with LeGall 5/3):
    Y = (R + 2G + B) >> 2 ;  U = B - G ;  V = R - G
  exactly invertible in integers via G = Y - ((U + V) >> 2).
* ICT — irreversible BT.601 YCbCr (lossy path, pairs with Haar/CDF 9/7),
  float32.

All functions take planar ``(..., 3, H, W)`` arrays with the channel axis
third-from-last and are jit-safe elementwise ops (XLA fuses them into the
surrounding pipeline).
"""

from __future__ import annotations

import jax.numpy as jnp


def rct_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """Planar RGB int -> (Y, U, V) int32. Y in [0, 255]; U, V in [-255, 255]
    for uint8 input."""
    x = x.astype(jnp.int32)
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    y = (r + 2 * g + b) >> 2
    u = b - g
    v = r - g
    return jnp.stack([y, u, v], axis=-3)


def rct_inv(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of :func:`rct_fwd` (int32 -> int32 RGB)."""
    x = x.astype(jnp.int32)
    y, u, v = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    g = y - ((u + v) >> 2)
    b = u + g
    r = v + g
    return jnp.stack([r, g, b], axis=-3)


# BT.601 full-range ICT (JPEG2000 irreversible component transform)
_ICT = (
    (0.299, 0.587, 0.114),
    (-0.168736, -0.331264, 0.5),
    (0.5, -0.418688, -0.081312),
)
_ICT_INV = (
    (1.0, 0.0, 1.402),
    (1.0, -0.344136, -0.714136),
    (1.0, 1.772, 0.0),
)


def ict_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """Planar RGB -> YCbCr float32 (Cb/Cr zero-centered)."""
    x = x.astype(jnp.float32)
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    planes = [m[0] * r + m[1] * g + m[2] * b for m in _ICT]
    return jnp.stack(planes, axis=-3)


def ict_inv(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    y, cb, cr = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    planes = [m[0] * y + m[1] * cb + m[2] * cr for m in _ICT_INV]
    return jnp.stack(planes, axis=-3)
