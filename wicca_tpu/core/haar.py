"""Multi-level 2-D Haar DWT / IDWT and LL-subband icon extraction — pure jnp.

This is the CPU-runnable numerical reference core of the framework (SURVEY.md
§7 L1). The reference project computes *only* the LL branch as repeated 2x2
block means and has no inverse transform (/root/reference/wicca/
wavelet_coder.py:50-67; SURVEY.md §2.3). Here we implement the full forward
transform (LL/LH/HL/HH per level), the exact inverse, and the reference-parity
icon path.

Numerical contract (bit-exactness vs the reference HaarCoder, SURVEY.md §2.3):
for uint8 input cast to float32, each LL element at every level is computed as

    LL[i,j] = ((a + c) + (b + d)) * 0.25        (float32, fixed association)

where ``a,b,c,d`` are the 2x2 block entries, the *row* pair (a+c)/(b+d) summed
first — exactly the reference's ``evens+odds`` then column-pair ``*0.25``
order (wavelet_coder.py:62-65). XLA does not reassociate distinct IEEE adds,
so the jnp chain below is bit-identical to the numpy oracle. The final icon is
``clip(0,255).astype(uint8)`` — clip then truncate toward zero
(wavelet_coder.py:67).

Normalization: "image" normalization — lowpass DC gain 1 per level (LL of a
constant image is that constant; LL stays in [0, 255]). The level transform

    rs = e_r + o_r ; rd = e_r - o_r            (row pairs, scale 2x)
    LL = (rs_e + rs_o) * 0.25                  (vert low,  horz low)
    LH = (rs_e - rs_o) * 0.25                  (vert low,  horz high)
    HL = (rd_e + rd_o) * 0.25                  (vert high, horz low)
    HH = (rd_e - rd_o) * 0.25                  (vert high, horz high)

is exactly invertible; for integer-valued inputs the float32 roundtrip is
bit-exact up to depth 8 (values are dyadic rationals needing <= 8 + 2*depth
mantissa bits < 24).

Layout: all functions operate on the trailing two axes of ``(..., H, W)``
arrays — the TPU planar layout with W on the 128-lane dimension. Channels /
batch fold into leading axes. HWC<->planar conversion lives in
:mod:`wicca_tpu.data.loader`.

Subband naming: ``XY`` = (vertical filter, horizontal filter); LH = low
vertical / high horizontal (horizontal-edge-free, vertical-edge-sensitive
content rides in HL).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from wicca_tpu.core.pad import pad_to_multiple, unpad


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ll", "details"],
    meta_fields=["wavelet", "orig_shape"],
)
@dataclasses.dataclass(frozen=True)
class Pyramid:
    """A multi-level 2-D wavelet decomposition.

    ``details[k]`` is the ``(lh, hl, hh)`` triple of level ``k+1`` (finest
    first); ``ll`` is the coarsest approximation. ``orig_shape`` records the
    pre-padding spatial dims so the inverse can crop back.
    """

    ll: jax.Array
    details: tuple[tuple[jax.Array, jax.Array, jax.Array], ...]
    wavelet: str = "haar"
    orig_shape: tuple[int, int] | None = None

    @property
    def levels(self) -> int:
        return len(self.details)


def _split_pairs(x: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Even/odd elements along ``axis`` (must have even extent)."""
    if axis == -1:
        return x[..., 0::2], x[..., 1::2]
    if axis == -2:
        return x[..., 0::2, :], x[..., 1::2, :]
    raise ValueError("axis must be -1 or -2")


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of _split_pairs: merge even/odd halves along ``axis``."""
    stacked = jnp.stack([a, b], axis=a.ndim if axis == -1 else a.ndim - 1)
    if axis == -1:
        return stacked.reshape(*a.shape[:-1], a.shape[-1] * 2)
    return stacked.reshape(*a.shape[:-2], a.shape[-2] * 2, a.shape[-1])


def dwt2_level(x: jnp.ndarray):
    """One level of the 2-D Haar transform in image normalization.

    Returns ``(ll, lh, hl, hh)``, each with trailing dims (H/2, W/2). The LL
    branch reproduces the reference block-mean association order bit-exactly
    (wavelet_coder.py:62-65).
    """
    e_r, o_r = _split_pairs(x, axis=-2)
    rs = e_r + o_r
    rd = e_r - o_r
    rs_e, rs_o = _split_pairs(rs, axis=-1)
    rd_e, rd_o = _split_pairs(rd, axis=-1)
    ll = (rs_e + rs_o) * 0.25
    lh = (rs_e - rs_o) * 0.25
    hl = (rd_e + rd_o) * 0.25
    hh = (rd_e - rd_o) * 0.25
    return ll, lh, hl, hh


def idwt2_level(ll, lh, hl, hh) -> jnp.ndarray:
    """Exact inverse of :func:`dwt2_level` (all scalings are powers of two)."""
    rs_e = (ll + lh) * 2.0
    rs_o = (ll - lh) * 2.0
    rd_e = (hl + hh) * 2.0
    rd_o = (hl - hh) * 2.0
    rs = _interleave(rs_e, rs_o, axis=-1)
    rd = _interleave(rd_e, rd_o, axis=-1)
    e_r = (rs + rd) * 0.5
    o_r = (rs - rd) * 0.5
    return _interleave(e_r, o_r, axis=-2)


def dwt2(x: jnp.ndarray, levels: int, mode="replicate", constant=0) -> Pyramid:
    """Multi-level 2-D Haar decomposition of ``(..., H, W)`` float data.

    Pads bottom/right to a multiple of ``2**levels`` first (reference
    wavelet_coder.py:58-59 pads once up-front), then recurses on LL.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    orig = (x.shape[-2], x.shape[-1])
    x = pad_to_multiple(x, 2**levels, mode=mode, constant=constant)
    x = x.astype(jnp.float32)
    details = []
    ll = x
    for _ in range(levels):
        ll, lh, hl, hh = dwt2_level(ll)
        details.append((lh, hl, hh))
    return Pyramid(ll=ll, details=tuple(details), wavelet="haar", orig_shape=orig)


def idwt2(pyr: Pyramid) -> jnp.ndarray:
    """Full inverse: reconstruct ``(..., H, W)`` cropped to the original dims."""
    x = pyr.ll
    for lh, hl, hh in reversed(pyr.details):
        x = idwt2_level(x, lh, hl, hh)
    if pyr.orig_shape is not None:
        x = unpad(x, *pyr.orig_shape)
    return x


def block_mean_ll(x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """LL-only chain (the reference's entire transform, wavelet_coder.py:61-65).

    ``x`` must be float32 with trailing dims divisible by ``2**depth``.
    Bit-exact vs the reference for identical inputs.
    """
    ll = x
    for _ in range(depth):
        e_r, o_r = _split_pairs(ll, axis=-2)
        rs = e_r + o_r
        rs_e, rs_o = _split_pairs(rs, axis=-1)
        ll = (rs_e + rs_o) * 0.25
    return ll


def haar_icon(image: jnp.ndarray, depth: int, mode="replicate", constant=0) -> jnp.ndarray:
    """Reference-parity icon: pad, float32 block-mean chain, clip, uint8.

    Equivalent of HaarCoder.get_small_copy (wavelet_coder.py:50-67) on planar
    ``(..., H, W)`` input (uint8 or float). Bit-exact vs the reference per
    SURVEY.md §2.3: final ``clip(0,255)`` then truncation toward zero.
    """
    x = pad_to_multiple(image, 2**depth, mode=mode, constant=constant).astype(jnp.float32)
    ll = block_mean_ll(x, depth)
    return jnp.clip(ll, 0, 255).astype(jnp.uint8)
