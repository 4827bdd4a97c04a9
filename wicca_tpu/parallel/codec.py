"""Mesh-sharded codec: encode/decode CodeStreams across a (ty, tx) device
mesh (BASELINE.json config 5 end-to-end — not just the transform).

``tiled_encode`` runs the halo-exchanged tiled transforms of
:mod:`wicca_tpu.parallel.tiled` and quantizes the subbands in-mesh, emitting
a regular :class:`wicca_tpu.codec.pipeline.CodeStream` — the SAME object the
single-device pipeline produces, so it serializes to ``.wct``, feeds
:func:`wicca_tpu.codec.decode` / ``decode_region`` / ``decode_at_level``,
and round-trips through quality layers. ``tiled_decode`` is the sharded
inverse for decoding on a mesh.

Interoperability / exactness:

* haar / haar_int are pair-local — tiled coefficients are bit-identical to
  the single-device encoder at any mesh shape, and streams cross freely
  between tiled and single-device encode/decode.
* wide wavelets (db2 / bior4.4 / cdf97): the ppermute halo exchange computes
  the WHOLE-IMAGE lifting transform, so streams carry ``layout='global'``
  and single-device decode inverts them with :mod:`wicca_tpu.core.lifting`.
  Decoding on a mesh is exact when the stream's plane dims divide the mesh
  tiling (guaranteed when encode used the same mesh).

Reference: the reference has no codec and no distribution at all
(SURVEY.md §0, §2.2); this is the north-star multi-host path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from wicca_tpu.codec.pipeline import CodeStream, _finish_decode
from wicca_tpu.core.haar import Pyramid
from wicca_tpu.core.lifting import is_integer_wavelet
from wicca_tpu.core.quant import QuantSpec, dequantize_deadzone, quantize_deadzone
from wicca_tpu.ops.dwt_pallas import _detail_dtype
from wicca_tpu.parallel.tiled import tiled_dwt2, tiled_idwt2


def tiled_encode(
    image,
    levels: int = 5,
    spec: QuantSpec = QuantSpec(),
    wavelet: str = "haar",
    *,
    mesh: Mesh,
    mode: str = "replicate",
    constant: int = 0,
    color: str = "none",
    chroma_gain: float = 1.0,
) -> CodeStream:
    """Planar ``(..., H, W)`` image sharded over (ty, tx) -> CodeStream.

    Same contract as :func:`wicca_tpu.codec.encode` (integer wavelets are
    LOSSLESS and ignore ``spec``), computed across the mesh with per-level
    ppermute halos for wide wavelets."""
    if color not in ("none", "rct", "ict"):
        raise ValueError(f"color must be none|rct|ict, got {color!r}")
    if wavelet == "cdf53":
        wavelet = "legall5.3"
    integer = is_integer_wavelet(wavelet)
    if color == "rct" and not integer:
        raise ValueError("rct is reversible — pair it with an integer wavelet")
    if color == "ict" and integer:
        raise ValueError("ict is lossy — pair it with a float wavelet")
    x = image
    if color == "rct":
        from wicca_tpu.core.color import rct_fwd

        x = rct_fwd(x)
    elif color == "ict":
        from wicca_tpu.core.color import ict_fwd

        x = ict_fwd(x)
        if chroma_gain != 1.0:
            x = x * jnp.array([1.0, 1.0 / chroma_gain, 1.0 / chroma_gain], jnp.float32).reshape(3, 1, 1)
    pyr = tiled_dwt2(x, levels, wavelet, mesh=mesh, mode=mode, constant=constant)
    details = []
    for lvl, (lh, hl, hh) in enumerate(pyr.details, start=1):
        if integer:
            bands = tuple(b.astype(jnp.int16) for b in (lh, hl, hh))
        else:
            step = spec.detail_step(lvl)
            dt, _ = _detail_dtype(step) if wavelet == "haar" else (jnp.int16, None)
            bands = tuple(quantize_deadzone(b, step, dt) for b in (lh, hl, hh))
        details.append(bands)
    # haar-family transforms are pair-local (tiling invisible) -> the default
    # 'tiled' layout; halo-exchanged wide wavelets ARE the global transform
    layout = "tiled" if wavelet in ("haar", "haar_int") else "global"
    return CodeStream(
        ll=pyr.ll if not integer else pyr.ll.astype(jnp.int32),
        details=tuple(details),
        spec=spec,
        levels=levels,
        orig_shape=(image.shape[-2], image.shape[-1]),
        wavelet=wavelet,
        color=color,
        chroma_gain=chroma_gain,
        layout=layout,
    )


def tiled_decode(stream: CodeStream, *, mesh: Mesh, emit_u8: bool = False):
    """Sharded inverse of :func:`tiled_encode` (any CodeStream whose plane
    dims divide the mesh tiling)."""
    integer = is_integer_wavelet(stream.wavelet)
    details = []
    for lvl, bands in enumerate(stream.details, start=1):
        if integer:
            details.append(tuple(b.astype(jnp.int32) for b in bands))
        else:
            step = stream.spec.detail_step(lvl)
            details.append(tuple(dequantize_deadzone(b, step) for b in bands))
    pyr = Pyramid(
        ll=stream.ll.astype(jnp.int32 if integer else jnp.float32),
        details=tuple(details),
        wavelet=stream.wavelet,
        orig_shape=None,  # crop after the color inverse, via _finish_decode
    )
    x = tiled_idwt2(pyr, mesh=mesh)
    return _finish_decode(stream, x, emit_u8)
