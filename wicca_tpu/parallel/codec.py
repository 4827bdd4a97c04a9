"""Mesh-sharded codec: encode/decode CodeStreams across a (ty, tx) device
mesh (BASELINE.json config 5 end-to-end — not just the transform).

``tiled_encode`` emits a regular :class:`wicca_tpu.codec.pipeline.CodeStream`
— the SAME object the single-device pipeline produces, so it serializes to
``.wct``, feeds :func:`wicca_tpu.codec.decode` / ``decode_region`` /
``decode_at_level``, and round-trips through quality layers. ``tiled_decode``
is the sharded inverse for decoding on a mesh.

Fast path — per-shard fused Pallas kernels (zero halo logic):

* haar / haar_int are PAIR-LOCAL, so each shard runs the same fused
  DWT+quantize kernels as the single-device encoder
  (:mod:`wicca_tpu.ops.dwt_pallas` / :mod:`~wicca_tpu.ops.dwt53_pallas`)
  on its local tile, and the gathered stream is BIT-IDENTICAL to the
  single-device encoder at any mesh shape (pinned in tests/test_tiled_codec).
  Stored subbands are cropped to the semantic extent on both paths, which is
  what makes the streams mesh-shape-independent.
* legall5.3 is tile-local with a (512, 1024)-per-pass tile grid: when the
  image dims align the shard grid with that tile grid
  (:func:`mesh53_aligned`), each shard runs the fused 5/3 kernels and the
  stream is again bit-identical to the single-device encoder. Unaligned
  images fall back to the halo path below.

Fallback — halo-exchanged global lifting: wide wavelets (db2 / bior4.4 /
cdf97, unaligned legall5.3) run the per-level ppermute halo exchange of
:mod:`wicca_tpu.parallel.tiled`, computing the WHOLE-IMAGE transform; such
streams carry ``layout='global'`` and single-device decode inverts them with
:mod:`wicca_tpu.core.lifting`.

Reference: the reference has no codec and no distribution at all
(SURVEY.md §0, §2.2); this is the north-star multi-host path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from wicca_tpu.codec.pipeline import CodeStream, _crop_semantic, _finish_decode, _pass_sizes
from wicca_tpu.core.haar import Pyramid
from wicca_tpu.core.lifting import is_integer_wavelet
from wicca_tpu.core.quant import QuantSpec, dequantize_deadzone, quantize_deadzone
from wicca_tpu.ops.dwt_pallas import _TILE_H, _TILE_W, _detail_dtype
from wicca_tpu.parallel.mesh import TILE_COL_AXIS, TILE_ROW_AXIS
from wicca_tpu.parallel.tiled import _img_spec, _pad_for_mesh, _shard_map, tiled_dwt2, tiled_idwt2


def _shard_map_pallas(fn, **kw):
    """shard_map for bodies containing pallas_call: its out ShapeDtypeStructs
    carry no varying-mesh-axes info, so the vma check must be off."""
    try:
        return _shard_map(fn, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        return _shard_map(fn, check_rep=False, **kw)


def mesh53_aligned(h_sem: int, w_sem: int, ty: int, tx: int, levels: int) -> bool:
    """True when every fused 5/3 pass's input dims are multiples of
    ``(ty * 512, tx * 1024)`` — then each shard's tile grid coincides with the
    single-device encoder's image-relative grid (same tiles, same edge clamps)
    and the per-shard Pallas path reproduces the single-device stream."""
    start = 0
    for k in _pass_sizes(levels):
        if (h_sem >> start) % (ty * _TILE_H) or (w_sem >> start) % (tx * _TILE_W):
            return False
        start += k
    return True


def _fused_encode_fn(levels: int, spec: QuantSpec, wavelet: str, lh: int, lw: int):
    """Per-shard encode over a (lh, lw) local tile via the fused kernels,
    cropping each pass's tile padding back to the local semantic extent."""
    from wicca_tpu.ops.dwt53_pallas import dwt53_multilevel_pallas
    from wicca_tpu.ops.dwt_pallas import dwt_multilevel_quant_pallas

    sizes = _pass_sizes(levels)

    def fn(xl):
        ll = xl
        dets = []
        lvl = 0
        for k in sizes:
            ll = ll[..., : lh >> lvl, : lw >> lvl]
            if wavelet == "haar":
                steps = tuple(spec.band_steps(lvl + i + 1) for i in range(k))
                ll, d = dwt_multilevel_quant_pallas(ll, steps)
            else:
                ll, d = dwt53_multilevel_pallas(ll, k, filt=wavelet)
            for i, bands in enumerate(d, start=1):
                g = lvl + i
                dets.append(tuple(b[..., : lh >> g, : lw >> g] for b in bands))
            lvl += k
        return ll[..., : lh >> levels, : lw >> levels], tuple(dets)

    return fn


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
    LOSSLESS and ignore ``spec``). haar / haar_int (always) and legall5.3
    (when :func:`mesh53_aligned`) run the fused Pallas kernels per shard and
    produce streams bit-identical to the single-device encoder; other wide
    wavelets compute the whole-image transform with per-level ppermute
    halos."""
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

    ty, tx = mesh.shape[TILE_ROW_AXIS], mesh.shape[TILE_COL_AXIS]
    unit = 1 << levels
    h_sem = x.shape[-2] + (-x.shape[-2] % unit)
    w_sem = x.shape[-1] + (-x.shape[-1] % unit)
    fused = wavelet in ("haar", "haar_int") or (
        wavelet == "legall5.3" and mesh53_aligned(h_sem, w_sem, ty, tx, levels)
    )
    if fused:
        xp = _pad_for_mesh(x, levels, mesh, mode, constant)
        if wavelet != "haar" and xp.dtype != jnp.uint8:
            xp = xp.astype(jnp.int32)  # integer lifting input (rct planes etc.)
        sp = _img_spec(xp.ndim)
        lh, lw = xp.shape[-2] // ty, xp.shape[-1] // tx
        fn = _fused_encode_fn(levels, spec, wavelet, lh, lw)
        out_specs = (sp, tuple((sp, sp, sp) for _ in range(levels)))
        ll, details = _shard_map_pallas(fn, mesh=mesh, in_specs=(sp,), out_specs=out_specs)(xp)
        if wavelet != "legall5.3":
            # pair-local: drop the mesh alignment padding -> semantic shapes,
            # identical to the single-device stream (aligned 5/3 has none)
            ll, details = _crop_semantic(ll, details, h_sem, w_sem, levels)
        return CodeStream(
            ll=ll,
            details=tuple(details),
            spec=spec,
            levels=levels,
            orig_shape=(image.shape[-2], image.shape[-1]),
            wavelet=wavelet,
            color=color,
            chroma_gain=chroma_gain,
            layout="tiled",
        )

    pyr = tiled_dwt2(x, levels, wavelet, mesh=mesh, mode=mode, constant=constant)
    details = []
    for lvl, (lh_b, hl_b, hh_b) in enumerate(pyr.details, start=1):
        if integer:
            bands = tuple(b.astype(jnp.int16) for b in (lh_b, hl_b, hh_b))
        else:
            bsteps = spec.band_steps(lvl)
            dt, _ = _detail_dtype(min(bsteps)) if wavelet == "haar" else (jnp.int16, None)
            bands = tuple(quantize_deadzone(b, s_b, dt) for b, s_b in zip((lh_b, hl_b, hh_b), bsteps))
        details.append(bands)
    # the halo-exchanged transform IS the whole-image (global) transform
    return CodeStream(
        ll=pyr.ll if not integer else pyr.ll.astype(jnp.int32),
        details=tuple(details),
        spec=spec,
        levels=levels,
        orig_shape=(image.shape[-2], image.shape[-1]),
        wavelet=wavelet,
        color=color,
        chroma_gain=chroma_gain,
        layout="global",
    )


def _pad_band_to(b, rows: int, cols: int):
    pr, pc = rows - b.shape[-2], cols - b.shape[-1]
    if pr or pc:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, pr), (0, pc)], mode="edge")
    return b


def tiled_decode(stream: CodeStream, *, mesh: Mesh, emit_u8: bool = False):
    """Sharded inverse of :func:`tiled_encode`.

    haar / haar_int streams (and mesh-aligned legall5.3 streams) decode
    per-shard through the fused Pallas kernels; 'global'-layout streams run
    the halo-exchanged inverse. A tile-local wide-wavelet stream whose tile
    grid cannot align with this mesh falls back to the single-device decoder
    (correctness over shard-parallelism)."""
    from wicca_tpu.codec.pipeline import decode as _decode_single

    ty, tx = mesh.shape[TILE_ROW_AXIS], mesh.shape[TILE_COL_AXIS]
    levels = stream.levels
    sizes = _pass_sizes(levels)
    integer = is_integer_wavelet(stream.wavelet)
    h_sem = stream.ll.shape[-2] << levels
    w_sem = stream.ll.shape[-1] << levels

    fused = (
        stream.layout == "tiled"
        and stream.bit_depth == 8
        and not stream.roi_shift
        and (
            stream.wavelet in ("haar", "haar_int")
            or (
                stream.wavelet in ("legall5.3", "cdf53")
                and mesh53_aligned(h_sem, w_sem, ty, tx, levels)
            )
        )
    )
    if fused:
        # mesh-geometry padding: grow every band to the _pad_for_mesh extent
        # (pair-local transforms put padding-born junk only in padding rows,
        # which the final unpad removes; aligned 5/3 needs no padding)
        unit = 1 << levels
        h_dec = h_sem + (-h_sem % (ty * unit))
        w_dec = w_sem + (-w_sem % (tx * unit))
        ll = _pad_band_to(stream.ll, h_dec >> levels, w_dec >> levels)
        details = tuple(
            tuple(_pad_band_to(b, h_dec >> l, w_dec >> l) for b in stream.details[l - 1])
            for l in range(1, levels + 1)
        )
        u8_in = emit_u8 and stream.color == "none"
        wavelet, spec = stream.wavelet, stream.spec
        if wavelet == "cdf53":
            wavelet = "legall5.3"

        lh_out, lw_out = h_dec // ty, w_dec // tx

        def fn(ll_l, dets_l):
            from wicca_tpu.ops.dwt53_pallas import idwt53_multilevel_pallas
            from wicca_tpu.ops.dwt_pallas import idwt_multilevel_dequant_pallas

            x = ll_l
            hi = levels
            for k in reversed(sizes):
                lo = hi - k
                use = [dets_l[i] for i in range(lo, hi)]
                ch, cw = use[-1][0].shape[-2], use[-1][0].shape[-1]
                x = x[..., :ch, :cw]
                if wavelet == "haar":
                    steps = tuple(spec.band_steps(i + 1) for i in range(lo, hi))
                    x = idwt_multilevel_dequant_pallas(x, use, steps, emit_u8=u8_in and lo == 0)
                else:
                    x = idwt53_multilevel_pallas(x, use, k, emit_u8=u8_in and lo == 0, filt=wavelet)
                hi = lo
            # drop the kernels' per-shard tile padding so gathered shards abut
            # at the local semantic extent
            return x[..., :lh_out, :lw_out]

        sp = _img_spec(ll.ndim)
        in_specs = (sp, tuple((sp, sp, sp) for _ in range(levels)))
        x = _shard_map_pallas(fn, mesh=mesh, in_specs=in_specs, out_specs=sp)(ll, details)
        return _finish_decode(stream, x, emit_u8)

    if stream.layout == "tiled" and stream.wavelet not in ("haar", "haar_int"):
        # tile-local geometry that cannot map onto this mesh: decode exactly
        # on the default device instead of decoding it wrong in parallel
        return _decode_single(stream, emit_u8=emit_u8)

    details = []
    for lvl, bands in enumerate(stream.details, start=1):
        if integer:
            details.append(tuple(b.astype(jnp.int32) for b in bands))
        else:
            details.append(tuple(
                dequantize_deadzone(b, s_b)
                for b, s_b in zip(bands, stream.spec.band_steps(lvl))
            ))
    pyr = Pyramid(
        ll=stream.ll.astype(jnp.int32 if integer else jnp.float32),
        details=tuple(details),
        wavelet=stream.wavelet,
        orig_shape=None,  # crop after the color inverse, via _finish_decode
    )
    x = tiled_idwt2(pyr, mesh=mesh)
    return _finish_decode(stream, x, emit_u8)
