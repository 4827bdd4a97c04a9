"""Lifting-scheme wavelet transforms: lossless integer Haar (S-transform),
db2 (D4) and bior4.4 (CDF 9/7) — pure jnp, jit-safe.

The reference has no inverse transform and a single wavelet (SURVEY.md §0);
its extension point is the WaveletCoder ABC (/root/reference/wicca/
wavelet_coder.py:26-38). Here the extension point is *data*: every transform
is a sequence of lifting steps, so new wavelets are added by writing two
small 1-D predict/update functions (BASELINE.json config 5: "add db2/bior4.4
wavelets").

Lifting is applied along the last axis; the row pass reuses the same code via
a swapaxes. Boundary handling is edge replication via index clamping, which
keeps every step exactly invertible regardless of signal length (each step
only ever adds a function of the *other* polyphase channel).

Integer Haar (the lossless anchor, BASELINE north-star: "bit-exact ... for
lossless integer-lifting Haar"):

    d = o - e ; s = e + (d >> 1)      # floor average, int32
    inverse: e = s - (d >> 1) ; o = d + e

exactly invertible in int32 for any input. The LL (``s``) band equals
``floor((e+o)/2)`` per pass, so depth-d LL approximates the reference icon's
block mean with floor instead of float accumulation (the *float* parity icon
lives in :mod:`wicca_tpu.core.haar`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from wicca_tpu.core.haar import Pyramid, _interleave, _split_pairs
from wicca_tpu.core.pad import pad_to_multiple, unpad

# ---------------------------------------------------------------------------
# 1-D helpers (last axis)
# ---------------------------------------------------------------------------


def _shift(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x[n+k] along the last axis with edge replication (clamped indexing)."""
    if k == 0:
        return x
    n = x.shape[-1]
    if k > 0:
        body = x[..., k:]
        edge = jnp.repeat(x[..., -1:], k, axis=-1)
        return jnp.concatenate([body, edge], axis=-1) if n > k else jnp.repeat(x[..., -1:], n, axis=-1)
    k = -k
    body = x[..., :-k]
    edge = jnp.repeat(x[..., :1], k, axis=-1)
    return jnp.concatenate([edge, body], axis=-1) if n > k else jnp.repeat(x[..., :1], n, axis=-1)


# ---------------------------------------------------------------------------
# Integer Haar (S-transform)
# ---------------------------------------------------------------------------


def haar_int_fwd1d(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    e, o = _split_pairs(x, axis=-1)
    d = o - e
    s = e + (d >> 1)
    return s, d


def haar_int_inv1d(s: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    e = s - (d >> 1)
    o = d + e
    return _interleave(e, o, axis=-1)


# ---------------------------------------------------------------------------
# LeGall 5/3 (JPEG2000 reversible path) — integer lifting, exactly invertible
# ---------------------------------------------------------------------------


def legall53_fwd1d(x: jnp.ndarray, shift=_shift) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LeGall 5/3 analysis (the JPEG2000 lossless filter):

        d[n] = o[n] - floor((e[n] + e[n+1]) / 2)
        s[n] = e[n] + floor((d[n-1] + d[n] + 2) / 4)

    ``>>`` on int32 is an arithmetic shift = floor division, so every step is
    exactly invertible. DC gain of ``s`` is 1 (values stay in display range).
    """
    e, o = _split_pairs(x, axis=-1)
    d = o - ((e + shift(e, +1)) >> 1)
    s = e + ((shift(d, -1) + d + 2) >> 2)
    return s, d


def legall53_inv1d(s: jnp.ndarray, d: jnp.ndarray, shift=_shift) -> jnp.ndarray:
    e = s - ((shift(d, -1) + d + 2) >> 2)
    o = d + ((e + shift(e, +1)) >> 1)
    return _interleave(e, o, axis=-1)


# ---------------------------------------------------------------------------
# Float lifting wavelets: db2 (D4) and bior4.4 (CDF 9/7)
# ---------------------------------------------------------------------------

_SQ3 = math.sqrt(3.0)
_SQ2 = math.sqrt(2.0)
# D4 lifting factorization (Daubechies–Sweldens 1996 standard form), rescaled
# so the lowpass DC gain is 1 ("image" normalization: LL of a constant image
# is that constant, values stay in display range).
_D4_SCALE_S = (_SQ3 - 1.0) / _SQ2 / _SQ2  # extra 1/sqrt(2) -> DC gain 1
_D4_SCALE_D = (_SQ3 + 1.0) / _SQ2 / _SQ2

# CDF 9/7 lifting coefficients (JPEG2000 irreversible path).
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001  # lowpass DC response of the lifting chain; s /= K gives DC gain 1


def db2_fwd1d(x: jnp.ndarray, shift=_shift) -> tuple[jnp.ndarray, jnp.ndarray]:
    e, o = _split_pairs(x, axis=-1)
    s1 = e + _SQ3 * o
    d1 = o - (_SQ3 / 4.0) * s1 - ((_SQ3 - 2.0) / 4.0) * shift(s1, -1)
    s2 = s1 - shift(d1, +1)
    return _D4_SCALE_S * s2, _D4_SCALE_D * d1


def db2_inv1d(s: jnp.ndarray, d: jnp.ndarray, shift=_shift) -> jnp.ndarray:
    s2 = s / _D4_SCALE_S
    d1 = d / _D4_SCALE_D
    s1 = s2 + shift(d1, +1)
    o = d1 + (_SQ3 / 4.0) * s1 + ((_SQ3 - 2.0) / 4.0) * shift(s1, -1)
    e = s1 - _SQ3 * o
    return _interleave(e, o, axis=-1)


def cdf97_fwd1d(x: jnp.ndarray, shift=_shift) -> tuple[jnp.ndarray, jnp.ndarray]:
    e, o = _split_pairs(x, axis=-1)
    d = o + _A97 * (e + shift(e, +1))
    s = e + _B97 * (shift(d, -1) + d)
    d = d + _G97 * (s + shift(s, +1))
    s = s + _D97 * (shift(d, -1) + d)
    return s / _K97, d * _K97


def cdf97_inv1d(s: jnp.ndarray, d: jnp.ndarray, shift=_shift) -> jnp.ndarray:
    s = s * _K97
    d = d / _K97
    s = s - _D97 * (shift(d, -1) + d)
    d = d - _G97 * (s + shift(s, +1))
    s = s - _B97 * (shift(d, -1) + d)
    o = d - _A97 * (s + shift(s, +1))
    return _interleave(s, o, axis=-1)


_WAVELETS_1D = {
    "haar_int": (haar_int_fwd1d, haar_int_inv1d),
    "legall5.3": (legall53_fwd1d, legall53_inv1d),
    "cdf53": (legall53_fwd1d, legall53_inv1d),
    "db2": (db2_fwd1d, db2_inv1d),
    "bior4.4": (cdf97_fwd1d, cdf97_inv1d),
    "cdf97": (cdf97_fwd1d, cdf97_inv1d),
}

# Integer (reversible) wavelets: transforms run in int32 and invert exactly.
_INT_WAVELETS = frozenset({"haar_int", "legall5.3", "cdf53"})


def is_integer_wavelet(name: str) -> bool:
    return name in _INT_WAVELETS


def lifting_wavelets() -> tuple[str, ...]:
    return tuple(_WAVELETS_1D)


def register_wavelet(name: str, fwd1d, inv1d) -> None:
    """Extension point (parity with reference WaveletCoder ABC, SURVEY.md C1)."""
    _WAVELETS_1D[name] = (fwd1d, inv1d)


# ---------------------------------------------------------------------------
# 2-D separable levels + pyramids
# ---------------------------------------------------------------------------


def _rows(fn, *arrays):
    """Apply a last-axis function along the second-to-last axis."""
    swapped = [a.swapaxes(-1, -2) for a in arrays]
    out = fn(*swapped)
    if isinstance(out, tuple):
        return tuple(o.swapaxes(-1, -2) for o in out)
    return out.swapaxes(-1, -2)


def dwt2_level_lifting(x: jnp.ndarray, wavelet: str):
    """One separable 2-D level: columns pass then rows pass.

    Returns (ll, lh, hl, hh) with XY = (vertical, horizontal) filter naming
    as in :mod:`wicca_tpu.core.haar`.
    """
    fwd, _ = _WAVELETS_1D[wavelet]
    lo, hi = fwd(x)  # horizontal filtering (last axis)
    ll, hl_v = _rows(fwd, lo)  # vertical filtering of horizontal-low
    lh, hh_v = _rows(fwd, hi)
    return ll, lh, hl_v, hh_v


def idwt2_level_lifting(ll, lh, hl, hh, wavelet: str) -> jnp.ndarray:
    _, inv = _WAVELETS_1D[wavelet]
    lo = _rows(inv, ll, hl)
    hi = _rows(inv, lh, hh)
    return inv(lo, hi)


def dwt2_lifting(x: jnp.ndarray, levels: int, wavelet: str = "haar_int", mode="replicate", constant=0) -> Pyramid:
    """Multi-level lifting decomposition. Integer wavelets keep int dtype."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if wavelet not in _WAVELETS_1D:
        raise ValueError(f"Unknown wavelet {wavelet!r}; have {sorted(_WAVELETS_1D)}")
    orig = (x.shape[-2], x.shape[-1])
    x = pad_to_multiple(x, 2**levels, mode=mode, constant=constant)
    x = x.astype(jnp.int32) if is_integer_wavelet(wavelet) else x.astype(jnp.float32)
    details = []
    ll = x
    for _ in range(levels):
        ll, lh, hl, hh = dwt2_level_lifting(ll, wavelet)
        details.append((lh, hl, hh))
    return Pyramid(ll=ll, details=tuple(details), wavelet=wavelet, orig_shape=orig)


def idwt2_lifting(pyr: Pyramid) -> jnp.ndarray:
    """Inverse multi-level lifting transform; crops to the original dims."""
    x = pyr.ll
    for lh, hl, hh in reversed(pyr.details):
        x = idwt2_level_lifting(x, lh, hl, hh, pyr.wavelet)
    if pyr.orig_shape is not None:
        x = unpad(x, *pyr.orig_shape)
    return x
