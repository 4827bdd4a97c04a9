"""End-to-end image codec: multi-level fused DWT+quantize encode, fused
dequantize+IDWT decode (SURVEY.md §7 L4).

The reference has no codec — it discards details and has no inverse
(SURVEY.md §0). This is the north-star path (BASELINE.json): per-level Pallas
kernels fused with quantization on TPU (jnp/interpret off-TPU), deadzone
int8 detail codes, float32 LL carried losslessly until the final level.

``encode`` -> :class:`CodeStream` (pytree; int8 detail planes + coarse LL)
``decode`` -> reconstructed float32 image, cropped to the original dims.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from wicca_tpu.core.pad import pad_to_multiple, unpad
from wicca_tpu.core.quant import QuantSpec
from wicca_tpu.core.lifting import is_integer_wavelet as _is_int_wavelet
from wicca_tpu.ops.dwt_pallas import (
    dwt_multilevel_quant_pallas,
    idwt_multilevel_dequant_pallas,
)


def _pass_sizes(levels: int) -> list[int]:
    """Fine-side pass partition of a multi-level transform into fused Pallas
    passes of <= 3 levels (the encoder's grouping; decode must mirror it)."""
    sizes = []
    lvl = 0
    while lvl < levels:
        sizes.append(min(3, levels - lvl))
        lvl += sizes[-1]
    return sizes


def _crop_semantic(ll, details, h_sem: int, w_sem: int, levels: int):
    """Crop tile-alignment padding off stored subbands, keeping the semantic
    extent (h_sem, w_sem are the dims after the reference 2**levels padding).

    Only valid for PAIR-LOCAL transforms (haar block transform, haar_int
    S-transform): subband sample (i, j) of level l depends exactly on input
    block [i*2^l:(i+1)*2^l, j*2^l:(j+1)*2^l], so dropping padding-born samples
    never affects reconstruction of kept pixels. Wide wavelets (legall5.3 /
    9/7) must keep their padded tile geometry."""
    ll = ll[..., : h_sem >> levels, : w_sem >> levels]
    out = []
    for lvl, bands in enumerate(details, start=1):
        out.append(tuple(b[..., : h_sem >> lvl, : w_sem >> lvl] for b in bands))
    return ll, out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ll", "details"],
    meta_fields=[
        "spec", "levels", "orig_shape", "wavelet", "color", "chroma_gain",
        "layout", "bit_depth", "roi_shift", "bg_shift", "metadata", "band_div",
    ],
)
@dataclasses.dataclass(frozen=True)
class CodeStream:
    """Quantized multi-level representation. ``details[k]`` = (lh, hl, hh)
    int8 codes of level k+1 (finest first); ``ll`` = float32 coarse band
    (int32 for integer/lossless wavelets). ``color`` records a channel
    decorrelation applied before the transform ('rct' reversible / 'ict'
    BT.601, :mod:`wicca_tpu.core.color`); ``chroma_gain`` > 1 quantizes ICT
    chroma planes that much coarser. ``layout`` records the transform
    geometry for wide wavelets: 'tiled' = JPEG2000-style independent
    (512,1024) tiles (the fused Pallas kernels), 'global' = whole-image
    lifting (:mod:`wicca_tpu.core.lifting`). The two disagree at tile
    boundaries, so decode must invert with the encoder's geometry."""

    ll: jax.Array
    details: tuple[tuple[jax.Array, jax.Array, jax.Array], ...]
    spec: QuantSpec
    levels: int
    orig_shape: tuple[int, int]
    wavelet: str = "haar"
    color: str = "none"
    chroma_gain: float = 1.0
    layout: str = "tiled"
    bit_depth: int = 8  # sample precision: 8 (uint8) .. 16 (uint16)
    # maxshift ROI scaling (codec.roi.apply_roi): codes with magnitude
    # >= 2**roi_shift are region-of-interest (stored << roi_shift, exact);
    # the rest are background (stored >> bg_shift, i.e. 2**bg_shift coarser)
    roi_shift: int = 0
    bg_shift: int = 0
    # application metadata carried by the container (the JPEG2000 XML/UUID
    # box analog: EXIF dumps, ICC profiles, capture notes). Key/value byte
    # pairs as a tuple so the pytree stays hashable for jit; never touches
    # the transform. Attach with codec.with_metadata(); preserved by
    # save/load and transcode; shown by `info`.
    metadata: tuple[tuple[str, bytes], ...] = ()
    # per-plane integer step divisors from R-D-optimal truncation
    # (codec.rd.truncate — the post-compression-R-D half of EBCOT): plane i
    # (fine->coarse, (lh, hl, hh) per level) stores codes floor-divided by
    # band_div[i], decoded at step * band_div[i]. () = all 1 (no
    # truncation). Serialized as the WCT9 divisor table.
    band_div: tuple[int, ...] = ()

    def num_bytes(self) -> int:
        n = self.ll.size * self.ll.dtype.itemsize
        for bands in self.details:
            for b in bands:
                n += b.size * b.dtype.itemsize
        return n


@partial(
    jax.jit,
    static_argnames=("levels", "spec", "mode", "constant", "wavelet", "color", "chroma_gain", "bit_depth"),
)
def encode(
    image: jax.Array,
    levels: int = 5,
    spec: QuantSpec = QuantSpec(),
    mode: str = "replicate",
    constant: int = 0,
    wavelet: str = "haar",
    color: str = "none",
    chroma_gain: float = 1.0,
    bit_depth: int | None = None,
) -> CodeStream:
    """Planar ``(..., H, W)`` uint8/float -> CodeStream.

    ``wavelet='haar'`` uses the fused Pallas DWT+quantize kernel; db2 and
    bior4.4/cdf97 run as fused tile-local Pallas lifting passes
    (:mod:`wicca_tpu.ops.dwt97_pallas`; their detail dynamic range is wider
    than Haar's, so codes are int16); user-registered wavelets fall back to
    XLA-fused jnp lifting. Integer wavelets ('legall5.3' — the
    JPEG2000 reversible filter — or 'haar_int') produce a LOSSLESS stream:
    ``spec`` is ignored, detail codes are exact int16, and ``decode`` returns
    the input bit-exactly.

    ``color='rct'`` (integer wavelets, 3-channel input) applies the
    reversible color transform first — the lossless guarantee holds and the
    decorrelated planes entropy-code smaller. ``color='ict'`` (float
    wavelets) applies BT.601 YCbCr; ``chroma_gain`` > 1 quantizes Cb/Cr
    that much coarser (the classic perceptual allocation).

    ``bit_depth`` sets the sample precision (JPEG2000-style high-bit-depth
    support for medical/scientific imagery): default is inferred from the
    input dtype (uint16 -> 16, else 8). Depths 9..16 route through the
    whole-image XLA lifting path with int32 detail codes (exact for the
    reversible wavelets — lossless uint16 roundtrips bit-exactly); the
    fused Pallas kernels stay the 8-bit fast path. ``decode(emit_u8=True)``
    on a hi-depth stream emits uint16 clipped to ``2**bit_depth - 1``."""
    if bit_depth is None:
        bit_depth = 16 if image.dtype == jnp.uint16 else 8
    if not 8 <= bit_depth <= 16:
        raise ValueError(f"bit_depth must be in [8, 16], got {bit_depth}")
    if color not in ("none", "rct", "ict"):
        raise ValueError(f"color must be none|rct|ict, got {color!r}")
    if color != "none" and (image.ndim < 3 or image.shape[-3] not in (3, 4)):
        raise ValueError("color transforms need planar (..., 3|4, H, W) input (RGB or RGBA)")
    if color == "rct" and not _is_int_wavelet(wavelet):
        raise ValueError("rct is reversible — pair it with an integer wavelet")
    if color == "ict" and _is_int_wavelet(wavelet):
        raise ValueError("ict is lossy — pair it with a float wavelet")
    # store the canonical name so serialize/load is name-stable (the 'cdf53'
    # alias shares container id 5 with 'legall5.3')
    if wavelet == "cdf53":
        wavelet = "legall5.3"
    orig = (image.shape[-2], image.shape[-1])
    x = pad_to_multiple(image, 1 << levels, mode=mode, constant=constant)
    if color != "none":
        # an alpha plane (RGBA) bypasses the 3-channel rotation and rides the
        # same wavelet path untouched (JPEG2000 treats extra components the
        # same way: the MCT covers components 0-2 only)
        rgb, extra = (x[..., :3, :, :], x[..., 3:, :, :]) if x.shape[-3] == 4 else (x, None)
        if color == "rct":
            from wicca_tpu.core.color import rct_fwd

            rgb = rct_fwd(rgb)
        else:
            from wicca_tpu.core.color import ict_fwd

            rgb = ict_fwd(rgb)
            if chroma_gain != 1.0:
                rgb = rgb * jnp.array([1.0, 1.0 / chroma_gain, 1.0 / chroma_gain], jnp.float32).reshape(3, 1, 1)
        x = rgb if extra is None else jnp.concatenate([rgb, extra.astype(rgb.dtype)], axis=-3)
    details = []
    layout = "tiled"
    if bit_depth != 8:
        # hi-depth: whole-image XLA lifting, int32 codes (the Pallas kernels
        # are specialized to 8-bit int16/int8 emission; see docstring)
        from wicca_tpu.core.lifting import dwt2_level_lifting, lifting_wavelets
        from wicca_tpu.core.quant import quantize_deadzone

        if wavelet not in lifting_wavelets():
            raise ValueError(
                f"bit_depth {bit_depth} needs a lifting wavelet "
                f"({', '.join(sorted(lifting_wavelets()))}); for Haar use 'haar_int'"
            )
        layout = "global"
        if _is_int_wavelet(wavelet):
            ll = x.astype(jnp.int32)
            for _ in range(levels):
                ll, lh, hl, hh = dwt2_level_lifting(ll, wavelet)
                details.append(tuple(b.astype(jnp.int32) for b in (lh, hl, hh)))
        else:
            ll = x.astype(jnp.float32)
            for lvl in range(1, levels + 1):
                ll, lh, hl, hh = dwt2_level_lifting(ll, wavelet)
                details.append(tuple(
                    quantize_deadzone(b, s, jnp.int32)
                    for b, s in zip((lh, hl, hh), spec.band_steps(lvl))
                ))
    elif wavelet in ("legall5.3", "haar_int"):
        # fused tile-local Pallas passes (JPEG2000-style independent tiles
        # for 5/3; the haar_int S-transform is pair-local so its tiling is
        # invisible — coefficients are bit-identical to the whole-image
        # core.lifting transform). Detail codes are exact int16.
        from wicca_tpu.ops.dwt53_pallas import dwt53_multilevel_pallas

        ll = x
        lvl = 0
        while lvl < levels:
            k = min(3, levels - lvl)
            if wavelet == "haar_int":
                # pair-local: crop each pass's tile padding back to the
                # semantic extent (stored streams are then mesh-shape-
                # independent — parallel.codec.tiled_encode bit-matches)
                ll = ll[..., : x.shape[-2] >> lvl, : x.shape[-1] >> lvl]
            ll, dets = dwt53_multilevel_pallas(ll, k, filt=wavelet)
            details.extend(dets)
            lvl += k
        if wavelet == "haar_int":
            ll, details = _crop_semantic(ll, details, x.shape[-2], x.shape[-1], levels)
    elif wavelet == "haar":
        # fused passes of <=3 levels: one HBM read per pass; uint8 input
        # stays uint8 into the first pass (integer-exact early levels)
        ll = x
        lvl = 0
        while lvl < levels:
            k = min(3, levels - lvl)
            ll = ll[..., : x.shape[-2] >> lvl, : x.shape[-1] >> lvl]
            steps = tuple(spec.band_steps(lvl + i + 1) for i in range(k))
            ll, dets = dwt_multilevel_quant_pallas(ll, steps)
            details.extend(dets)
            lvl += k
        ll, details = _crop_semantic(ll, details, x.shape[-2], x.shape[-1], levels)
    elif wavelet in ("bior4.4", "cdf97", "db2"):
        # fused tile-local float-lifting passes (wicca_tpu.ops.dwt97_pallas)
        from wicca_tpu.ops.dwt97_pallas import dwt97_multilevel_quant_pallas

        filt = "db2" if wavelet == "db2" else "cdf97"
        ll = x
        lvl = 0
        while lvl < levels:
            k = min(3, levels - lvl)
            steps = tuple(spec.band_steps(lvl + i + 1) for i in range(k))
            ll, dets = dwt97_multilevel_quant_pallas(ll, steps, filt=filt)
            details.extend(dets)
            lvl += k
    else:
        x = x.astype(jnp.float32)
        from wicca_tpu.core.lifting import dwt2_level_lifting
        from wicca_tpu.core.quant import quantize_deadzone

        layout = "global"
        ll = x
        for lvl in range(1, levels + 1):
            ll, lh, hl, hh = dwt2_level_lifting(ll, wavelet)
            details.append(tuple(
                quantize_deadzone(b, s, jnp.int16)
                for b, s in zip((lh, hl, hh), spec.band_steps(lvl))
            ))
    return CodeStream(
        ll=ll, details=tuple(details), spec=spec, levels=levels, orig_shape=orig,
        wavelet=wavelet, color=color, chroma_gain=chroma_gain, layout=layout,
        bit_depth=bit_depth,
    )


def _scaled_steps(stream: CodeStream, lvl: int) -> tuple[float, float, float]:
    """Effective dequantization steps for level ``lvl``: the spec's band
    steps times the plane's R-D truncation divisor (band_div; 1 when absent).
    Every float-wavelet dequant site routes through this."""
    s = stream.spec.band_steps(lvl)
    if not stream.band_div:
        return s
    d = stream.band_div[(lvl - 1) * 3 : (lvl - 1) * 3 + 3]
    return (s[0] * d[0], s[1] * d[1], s[2] * d[2])


def _widen_div_int(stream: CodeStream) -> CodeStream:
    """Integer-wavelet streams with R-D divisors: re-widen codes to bin
    midpoints (sign * (|c| * d + d // 2), 0 stays 0 — deadzone-style, the
    same convention as container._widen_codes) so the exact integer lifting
    inverse applies unchanged. No-op otherwise."""
    if not stream.band_div or not _is_int_wavelet(stream.wavelet):
        return stream

    def widen(b, d):
        if d == 1:
            return b
        info = jnp.iinfo(b.dtype)
        bi = b.astype(jnp.int32)
        m = jnp.abs(bi)
        w = jnp.sign(bi) * jnp.minimum(m * d + d // 2, info.max)
        return w.astype(b.dtype)

    details = tuple(
        tuple(widen(b, d) for b, d in zip(bands, stream.band_div[lvl * 3 : lvl * 3 + 3]))
        for lvl, bands in enumerate(stream.details)
    )
    return dataclasses.replace(stream, details=details, band_div=())


def _normalize_roi(stream: CodeStream) -> CodeStream:
    """Undo maxshift ROI scaling (:mod:`wicca_tpu.codec.roi`): codes with
    ``|c| >= 2**roi_shift`` are ROI (exact ``>> roi_shift``), the rest are
    background (midpoint ``<< bg_shift``). Returns a stream of plain deadzone
    codes in the path's native dtype; no-op for non-ROI streams."""
    if not stream.roi_shift:
        return stream
    s, b = stream.roi_shift, stream.bg_shift
    dt = jnp.int32 if stream.bit_depth != 8 else (jnp.int8 if stream.wavelet == "haar" else jnp.int16)

    def un(c):
        v = c.astype(jnp.int32)
        m = jnp.abs(v)
        sg = jnp.sign(v)
        bg = sg * ((m << b) + (1 << (b - 1))) if b else v
        return jnp.where(m >= (1 << s), sg * (m >> s), bg).astype(dt)

    details = tuple(tuple(un(band) for band in bands) for bands in stream.details)
    return dataclasses.replace(stream, details=details, roi_shift=0, bg_shift=0)


def decode(stream: CodeStream, emit_u8: bool = False, recon_offset: float = 0.5) -> jax.Array:
    """CodeStream -> reconstructed image (original dims), float32 by default;
    ``emit_u8`` clips+casts inside the final fused pass (4x less output
    traffic — use when reconstructing for display/classification).

    ``recon_offset`` sets the deadzone reconstruction point as a fraction
    of the bin (0.5 = midpoint, the measured optimum on photo-like content
    — see :func:`wicca_tpu.core.quant.dequantize_deadzone` for the
    measurement; the knob is decoder-side only, no bitstream change).

    The encoder may tile-pad each level's input (see dwt_level_quant_pallas);
    stored subband shapes record it, so each reconstruction is cropped to the
    next-finer level's subband extent before combining."""
    # metadata is a meta_field (static in the pytree treedef), so it must be
    # stripped BEFORE the jitted core: otherwise every distinct metadata
    # value is a fresh jit cache key -> full retrace + device recompile per
    # file when decoding folders of WCT8 streams (ADVICE r3, medium), and
    # every dispatch hashes the full metadata bytes.
    return _decode_jit(
        dataclasses.replace(stream, metadata=()), emit_u8=emit_u8, recon_offset=recon_offset
    )


@partial(jax.jit, static_argnames=("emit_u8", "recon_offset"))
def _decode_jit(stream: CodeStream, emit_u8: bool = False, recon_offset: float = 0.5) -> jax.Array:
    stream = _widen_div_int(_normalize_roi(stream))
    # with a color transform the in-kernel u8 emission must wait until after
    # the inverse color rotation (shared tail below)
    u8_in = emit_u8 and stream.color == "none" and stream.bit_depth == 8
    tiled = stream.layout == "tiled"  # hi-depth streams are always 'global'
    x = stream.ll
    # haar_int is pair-local, so the fused kernel decodes BOTH layouts
    # bit-identically (old global-layout streams included); hi-depth streams
    # carry int32 codes and take the generic lifting branches below
    if stream.bit_depth == 8 and (
        stream.wavelet == "haar_int" or (stream.wavelet in ("legall5.3", "cdf53") and tiled)
    ):
        from wicca_tpu.ops.dwt53_pallas import idwt53_multilevel_pallas

        filt = "haar_int" if stream.wavelet == "haar_int" else "legall5.3"
        sizes = []
        lvl = 0
        while lvl < stream.levels:
            sizes.append(min(3, stream.levels - lvl))
            lvl += sizes[-1]
        hi = stream.levels
        for k in reversed(sizes):
            lo = hi - k
            dets = [stream.details[i] for i in range(lo, hi)]
            ch, cw = dets[-1][0].shape[-2], dets[-1][0].shape[-1]
            x = x[..., :ch, :cw]
            x = idwt53_multilevel_pallas(x, dets, k, emit_u8=u8_in and lo == 0, filt=filt)
            hi = lo
        return _finish_decode(stream, x, emit_u8)
    if _is_int_wavelet(stream.wavelet):
        from wicca_tpu.core.lifting import idwt2_level_lifting

        x = x.astype(jnp.int32)
        for lvl in range(stream.levels, 0, -1):
            lh, hl, hh = (b.astype(jnp.int32) for b in stream.details[lvl - 1])
            x = x[..., : lh.shape[-2], : lh.shape[-1]]
            x = idwt2_level_lifting(x, lh, hl, hh, stream.wavelet)
        return _finish_decode(stream, x, emit_u8)
    if stream.wavelet in ("bior4.4", "cdf97", "db2") and tiled:
        from wicca_tpu.ops.dwt97_pallas import idwt97_multilevel_dequant_pallas

        filt = "db2" if stream.wavelet == "db2" else "cdf97"
        sizes = []
        lvl = 0
        while lvl < stream.levels:
            sizes.append(min(3, stream.levels - lvl))
            lvl += sizes[-1]
        hi = stream.levels
        for k in reversed(sizes):
            lo = hi - k
            dets = [stream.details[i] for i in range(lo, hi)]
            steps = tuple(_scaled_steps(stream, i + 1) for i in range(lo, hi))
            ch, cw = dets[-1][0].shape[-2], dets[-1][0].shape[-1]
            x = x[..., :ch, :cw]
            x = idwt97_multilevel_dequant_pallas(x, dets, steps, emit_u8=u8_in and lo == 0, filt=filt, recon_offset=recon_offset)
            hi = lo
        return _finish_decode(stream, x, emit_u8)
    if stream.wavelet == "haar":
        # mirror the encoder's pass partition (fine-side groups of <=3)
        sizes = []
        lvl = 0
        while lvl < stream.levels:
            sizes.append(min(3, stream.levels - lvl))
            lvl += sizes[-1]
        hi = stream.levels
        for k in reversed(sizes):
            lo = hi - k  # pass covers levels lo+1..hi
            dets = [stream.details[i] for i in range(lo, hi)]
            steps = tuple(_scaled_steps(stream, i + 1) for i in range(lo, hi))
            from wicca_tpu.ops.dwt_pallas import detail_spatial_shape

            ch, cw = detail_spatial_shape(dets[-1][0], k)
            x = x[..., :ch, :cw]
            x = idwt_multilevel_dequant_pallas(x, dets, steps, emit_u8=u8_in and lo == 0, recon_offset=recon_offset)
            hi = lo
    else:
        from wicca_tpu.core.lifting import idwt2_level_lifting
        from wicca_tpu.core.quant import dequantize_deadzone

        for lvl in range(stream.levels, 0, -1):
            lh, hl, hh = stream.details[lvl - 1]
            s_lh, s_hl, s_hh = _scaled_steps(stream, lvl)
            x = x[..., : lh.shape[-2], : lh.shape[-1]]
            x = idwt2_level_lifting(
                x,
                dequantize_deadzone(lh, s_lh, offset=recon_offset),
                dequantize_deadzone(hl, s_hl, offset=recon_offset),
                dequantize_deadzone(hh, s_hh, offset=recon_offset),
                stream.wavelet,
            )
    return _finish_decode(stream, x, emit_u8)


def _undo_color(stream: CodeStream, x: jax.Array) -> jax.Array:
    if stream.color == "none":
        return x
    # RGBA: the alpha plane was never rotated (see encode) — invert the first
    # three planes only and carry the rest through
    yuv, extra = (x[..., :3, :, :], x[..., 3:, :, :]) if x.shape[-3] == 4 else (x, None)
    if stream.color == "rct":
        from wicca_tpu.core.color import rct_inv

        rgb = rct_inv(yuv)
    else:
        from wicca_tpu.core.color import ict_inv

        if stream.chroma_gain != 1.0:
            yuv = yuv * jnp.array([1.0, stream.chroma_gain, stream.chroma_gain], jnp.float32).reshape(3, 1, 1)
        rgb = ict_inv(yuv)
    return rgb if extra is None else jnp.concatenate([rgb, extra.astype(rgb.dtype)], axis=-3)


def _emit_native(stream: CodeStream, x: jax.Array) -> jax.Array:
    """Clip/cast to the stream's native unsigned sample type (uint8, or
    uint16 for hi-depth streams)."""
    peak = (1 << stream.bit_depth) - 1
    dt = jnp.uint8 if stream.bit_depth <= 8 else jnp.uint16
    return jnp.clip(x, 0, peak).astype(dt)


def _finish_decode(stream: CodeStream, x: jax.Array, emit_u8: bool) -> jax.Array:
    """Shared decode tail: inverse color rotation, then clip/cast if the
    kernel did not already emit uint8."""
    x = _undo_color(stream, x)
    if emit_u8 and x.dtype not in (jnp.uint8, jnp.uint16):
        x = _emit_native(stream, x)
    return unpad(x, *stream.orig_shape)


def with_metadata(stream: CodeStream, meta: dict[str, bytes | str]) -> CodeStream:
    """Attach application metadata (EXIF dump, ICC profile, notes — the
    JPEG2000 XML/UUID-box analog) to a stream. Values may be str (stored
    utf-8) or bytes; ``{}`` clears. Serialized in the WCT8 header block,
    preserved across save/load and transcode, ignored by decode."""
    items = tuple(
        (str(k), v.encode("utf-8") if isinstance(v, str) else bytes(v))
        for k, v in meta.items()
    )
    return dataclasses.replace(stream, metadata=items)


def icon_from_stream(stream: CodeStream) -> jax.Array:
    """Native-dtype icon straight from the coarse band (free at decode time;
    uint8, or uint16 for hi-depth streams). Color-transformed streams get the
    inverse rotation applied to the LL (per-pixel linear, so the coarse band
    rotates the same way)."""
    return _emit_native(stream, _undo_color(stream, stream.ll))


def compression_ratio(stream: CodeStream) -> float:
    """Raw uint8 bytes vs *stored* code bytes (≈1 for int8 codes — the
    entropy coder provides the actual size win; see entropy_ratio)."""
    h, w = stream.orig_shape
    lead = int(stream.ll.size // (stream.ll.shape[-2] * stream.ll.shape[-1]))
    return (lead * h * w) / stream.num_bytes()


def estimated_entropy_bytes(stream: CodeStream) -> float:
    """Shannon-entropy size of the detail codes + raw LL bytes — the target
    an order-0 entropy coder approaches (deadzone codes of natural images are
    overwhelmingly zero)."""
    import numpy as np

    total = float(stream.ll.size * stream.ll.dtype.itemsize)
    for bands in stream.details:
        for b in bands:
            codes = np.asarray(b).ravel()
            _, counts = np.unique(codes, return_counts=True)
            p = counts / codes.size
            bits = float(-(p * np.log2(p)).sum()) * codes.size
            total += bits / 8.0
    return total


def entropy_ratio(stream: CodeStream) -> float:
    """Raw uint8 bytes vs entropy-coded size estimate."""
    h, w = stream.orig_shape
    lead = int(stream.ll.size // (stream.ll.shape[-2] * stream.ll.shape[-1]))
    return (lead * h * w) / max(estimated_entropy_bytes(stream), 1.0)


def _pass_partition(levels: int) -> list[tuple[int, int]]:
    """Encoder pass partition (fine-side groups of <= 3 levels):
    ``[(lo, hi)]`` fine -> coarse; pass covers levels ``lo+1..hi``."""
    out, lvl = [], 0
    while lvl < levels:
        k = min(3, levels - lvl)
        out.append((lvl, lvl + k))
        lvl += k
    return out


def region_plan(stream: CodeStream, row0: int, row1: int, col0: int, col1: int):
    """Per-pass windows for a tiled wide-wavelet region decode (VERDICT r2
    weak #5: align each PASS to its own tile grid instead of aligning the
    whole slice to the coarsest pass's ``(512,1024) << shift`` pixel grid).

    Returns ``[(lo, hi, a0, a1, b0, b1)]`` coarse -> fine; the window of the
    pass covering levels ``lo+1..hi`` in its output space (the 1/2**lo
    grid), aligned to the encoder's (512, 1024) tile grid there and clamped
    to the stored (tile-padded) extent. Each pass's input needs are covered
    by the previous (coarser) pass's window by construction: rounding the
    same pixel window out to a coarser grid always contains it.
    """
    from wicca_tpu.ops.dwt_pallas import _TILE_H, _TILE_W

    plan = []
    for lo, hi in reversed(_pass_partition(stream.levels)):
        band = stream.details[lo][0]  # level lo+1 band = padded extent / 2
        eh, ew = band.shape[-2] * 2, band.shape[-1] * 2
        a0 = (row0 >> lo) // _TILE_H * _TILE_H
        b0 = (col0 >> lo) // _TILE_W * _TILE_W
        a1 = min(-(-(-(-row1 // (1 << lo))) // _TILE_H) * _TILE_H, eh)
        b1 = min(-(-(-(-col1 // (1 << lo))) // _TILE_W) * _TILE_W, ew)
        plan.append((lo, hi, a0, a1, b0, b1))
    return plan


def region_coefficient_fraction(stream: CodeStream, row0, row1, col0, col1) -> float:
    """Fraction of stored detail coefficients a tiled-wide region decode
    touches (coefficient-volume accounting for tests/monitoring)."""
    touched = total = 0
    for lo, hi, a0, a1, b0, b1 in region_plan(stream, row0, row1, col0, col1):
        for l in range(lo + 1, hi + 1):
            s = l - lo
            for b in stream.details[l - 1]:
                total += b.shape[-2] * b.shape[-1]
                touched += ((a1 >> s) - (a0 >> s)) * ((b1 >> s) - (b0 >> s))
    return touched / max(total, 1)


def _decode_region_tiled_wide(stream: CodeStream, row0, row1, col0, col1, emit_u8: bool, recon_offset: float = 0.5) -> jax.Array:
    """Hierarchical region decode for tiled wide wavelets: run the inverse
    pass cascade coarse -> fine, each pass on only its tile-aligned window
    (JPEG2000 tile-independence semantics). Bit-identical to the same crop
    of :func:`decode` because every pass sees exactly the encoder's tiles."""
    stream = _widen_div_int(_normalize_roi(stream))
    int53 = stream.wavelet in ("legall5.3", "cdf53")
    filt = "legall5.3" if int53 else ("db2" if stream.wavelet == "db2" else "cdf97")
    x = None
    pa0 = pb0 = 0
    for lo, hi, a0, a1, b0, b1 in region_plan(stream, row0, row1, col0, col1):
        k = hi - lo
        dets = [
            tuple(b[..., a0 >> s : a1 >> s, b0 >> s : b1 >> s] for b in stream.details[l - 1])
            for l, s in ((l, l - lo) for l in range(lo + 1, hi + 1))
        ]
        if x is None:
            ll = stream.ll[..., a0 >> k : a1 >> k, b0 >> k : b1 >> k]
        else:
            ll = x[..., (a0 >> k) - pa0 : (a1 >> k) - pa0, (b0 >> k) - pb0 : (b1 >> k) - pb0]
        if int53:
            from wicca_tpu.ops.dwt53_pallas import idwt53_multilevel_pallas

            x = idwt53_multilevel_pallas(ll, dets, k, filt=filt)
        else:
            from wicca_tpu.ops.dwt97_pallas import idwt97_multilevel_dequant_pallas

            steps = tuple(_scaled_steps(stream, i + 1) for i in range(lo, hi))
            x = idwt97_multilevel_dequant_pallas(ll, dets, steps, filt=filt, recon_offset=recon_offset)
        pa0, pb0 = a0, b0
    x = _undo_color(stream, x)
    if emit_u8:
        x = _emit_native(stream, x)
    return x[..., row0 - pa0 : row1 - pa0, col0 - pb0 : col1 - pb0]


def decode_region(
    stream: CodeStream,
    row0: int,
    row1: int,
    col0: int,
    col1: int,
    emit_u8: bool = False,
    recon_offset: float = 0.5,
) -> jax.Array:
    """Spatial random access: reconstruct only pixels ``[row0:row1, col0:col1)``
    — EXACTLY equal to the same crop of :func:`decode` — touching only the
    coefficients that contribute to the window.

    The coefficient slice is grown to the stream's localization geometry:

    * haar / haar_int — the transform is 2-tap block-structured, so a slice
      aligned to ``2**levels`` reconstructs bit-exactly with no margin.
    * tiled wide wavelets (legall5.3 / db2 / bior4.4 / cdf97) — tiles are
      independent (JPEG2000 semantics); the inverse cascade runs coarse ->
      fine with each PASS windowed to its own (512, 1024) tile grid
      (:func:`region_plan`), so a 512x512 window of a depth-5 8K stream
      touches only a few percent of the coefficients (the expensive fine
      planes align to (512, 1024) pixels, not ``(512,1024) << shift``).
    * global-layout wide wavelets — lifting has finite support, so a
      ``16 * 2**levels`` halo margin covers the inverse cascade's influence
      radius; the halo is cropped off before returning. Integer wavelets are
      bitwise equal to the full inverse; float wavelets match to within a few
      float32 ulps (XLA's fusion/FMA choices are shape-dependent, so two
      compilations of the same lifting graph at different shapes may round
      differently — measured <= ~1e-3 gray levels, far below the codec's
      quantization step).

    When the grown slice covers the whole image this degenerates to a full
    decode + crop (still exact, just not cheaper). For gigapixel streams at
    modest depth it reads a small fraction of the coefficient planes.
    """
    H, W = stream.orig_shape
    if not (0 <= row0 < row1 <= H and 0 <= col0 < col1 <= W):
        raise ValueError(f"region [{row0}:{row1}, {col0}:{col1}) outside image {(H, W)}")
    lv = stream.levels
    align = 1 << lv
    margin = 0
    align_r = align_c = align
    if stream.wavelet in ("haar", "haar_int"):
        pass  # block transform: alignment alone is exact
    elif stream.layout == "tiled":
        return _decode_region_tiled_wide(stream, row0, row1, col0, col1, emit_u8, recon_offset)
    else:
        # Inverse-lifting influence radius is <= ~6 polyphase samples per
        # level (cdf97: 4 chained +-1 steps), and level-l samples span 2**l
        # pixels, so sum_l 6*2**l < 16*2**lv pixels covers the cascade.
        margin = 16 << lv
    r0 = max(0, row0 - margin) // align_r * align_r
    c0 = max(0, col0 - margin) // align_c * align_c
    r1 = -(-(row1 + margin) // align_r) * align_r
    c1 = -(-(col1 + margin) // align_c) * align_c
    details = tuple(
        tuple(b[..., r0 >> l : r1 >> l, c0 >> l : c1 >> l] for b in stream.details[l - 1])
        for l in range(1, lv + 1)
    )
    ll = stream.ll[..., r0 >> lv : r1 >> lv, c0 >> lv : c1 >> lv]
    sub = dataclasses.replace(
        stream, ll=ll, details=details,
        orig_shape=(min(r1, H) - r0, min(c1, W) - c0),
    )
    out = decode(sub, emit_u8=emit_u8, recon_offset=recon_offset)
    return out[..., row0 - r0 : row1 - r0, col0 - c0 : col1 - c0]


def decode_at_level(stream: CodeStream, target_level: int, emit_u8: bool = False, recon_offset: float = 0.5) -> jax.Array:
    """Progressive decode: reconstruct at 1/2**target_level resolution using
    only the coarse subbands (resolution scalability — the stream is decoded
    from the tail, finer detail planes are never touched).

    ``target_level=0`` equals :func:`decode`; ``target_level=levels`` returns
    the (dequantized) LL band itself. Output dims are the original dims
    divided by 2**target_level (ceil).
    """
    if not 0 <= target_level <= stream.levels:
        raise ValueError(f"target_level must be in [0, {stream.levels}]")
    # strip metadata before the jitted core (see decode)
    return _decode_at_level_jit(
        dataclasses.replace(stream, metadata=()), target_level,
        emit_u8=emit_u8, recon_offset=recon_offset,
    )


@partial(jax.jit, static_argnames=("target_level", "emit_u8", "recon_offset"))
def _decode_at_level_jit(stream: CodeStream, target_level: int, emit_u8: bool = False, recon_offset: float = 0.5) -> jax.Array:
    if target_level == 0:
        return _decode_jit(stream, emit_u8=emit_u8, recon_offset=recon_offset)
    stream = _widen_div_int(_normalize_roi(stream))
    h, w = stream.orig_shape
    out_h = -(-h // (1 << target_level))
    out_w = -(-w // (1 << target_level))
    tiled = stream.layout == "tiled"
    if stream.wavelet == "haar_int" or (stream.wavelet in ("legall5.3", "cdf53") and tiled):
        from wicca_tpu.ops.dwt53_pallas import idwt53_multilevel_pallas

        filt = "haar_int" if stream.wavelet == "haar_int" else "legall5.3"
        x = stream.ll
        sizes = []
        lvl = 0
        while lvl < stream.levels:
            sizes.append(min(3, stream.levels - lvl))
            lvl += sizes[-1]
        hi = stream.levels
        for k in reversed(sizes):
            lo = hi - k
            if hi <= target_level:
                break
            use = [stream.details[i] for i in range(max(lo, target_level), hi)]
            ch, cw = use[-1][0].shape[-2], use[-1][0].shape[-1]
            x = x[..., :ch, :cw]
            # orig_k aligns the partial pass's tile-local clamps with the
            # encoder's full-pass tile grid
            x = idwt53_multilevel_pallas(x, use, len(use), orig_k=k, filt=filt)
            hi = max(lo, target_level)
        x = _undo_color(stream, x)
        x = unpad(x, out_h, out_w)
        if emit_u8:
            x = _emit_native(stream, x)
        return x
    if _is_int_wavelet(stream.wavelet):
        from wicca_tpu.core.lifting import idwt2_level_lifting

        x = stream.ll.astype(jnp.int32)
        for lvl in range(stream.levels, target_level, -1):
            lh, hl, hh = (b.astype(jnp.int32) for b in stream.details[lvl - 1])
            x = x[..., : lh.shape[-2], : lh.shape[-1]]
            x = idwt2_level_lifting(x, lh, hl, hh, stream.wavelet)
        x = _undo_color(stream, x)
        x = unpad(x, out_h, out_w)
        if emit_u8:
            x = _emit_native(stream, x)
        return x
    if stream.wavelet in ("bior4.4", "cdf97", "db2") and tiled:
        from wicca_tpu.ops.dwt97_pallas import idwt97_multilevel_dequant_pallas

        filt = "db2" if stream.wavelet == "db2" else "cdf97"
        x = stream.ll
        sizes = []
        lvl = 0
        while lvl < stream.levels:
            sizes.append(min(3, stream.levels - lvl))
            lvl += sizes[-1]
        hi = stream.levels
        for k in reversed(sizes):
            lo = hi - k
            if hi <= target_level:
                break
            use = [stream.details[i] for i in range(max(lo, target_level), hi)]
            steps = tuple(_scaled_steps(stream, i + 1) for i in range(max(lo, target_level), hi))
            ch, cw = use[-1][0].shape[-2], use[-1][0].shape[-1]
            x = x[..., :ch, :cw]
            x = idwt97_multilevel_dequant_pallas(x, use, steps, orig_k=k, filt=filt, recon_offset=recon_offset)
            hi = max(lo, target_level)
        x = _undo_color(stream, x)
        x = unpad(x, out_h, out_w)
        if emit_u8:
            x = _emit_native(stream, x)
        return x
    if stream.wavelet != "haar":
        from wicca_tpu.core.lifting import idwt2_level_lifting
        from wicca_tpu.core.quant import dequantize_deadzone

        x = stream.ll
        for lvl in range(stream.levels, target_level, -1):
            lh, hl, hh = stream.details[lvl - 1]
            s_lh, s_hl, s_hh = _scaled_steps(stream, lvl)
            x = x[..., : lh.shape[-2], : lh.shape[-1]]
            x = idwt2_level_lifting(
                x,
                dequantize_deadzone(lh, s_lh, offset=recon_offset),
                dequantize_deadzone(hl, s_hl, offset=recon_offset),
                dequantize_deadzone(hh, s_hh, offset=recon_offset),
                stream.wavelet,
            )
        x = _undo_color(stream, x)
        x = unpad(x, out_h, out_w)
        if emit_u8:
            x = _emit_native(stream, x)
        return x
    from wicca_tpu.ops import dwt_pallas as _dp
    from wicca_tpu.ops.dwt_pallas import detail_spatial_shape

    # partial passes renumber pass-local levels, which only matches the
    # stored layout when no level is stored transposed
    assert _dp._T_LVLS == 0, "decode_at_level requires untransposed detail storage"

    x = stream.ll
    sizes = []
    lvl = 0
    while lvl < stream.levels:
        sizes.append(min(3, stream.levels - lvl))
        lvl += sizes[-1]
    hi = stream.levels
    for k in reversed(sizes):
        lo = hi - k
        if hi <= target_level:
            break
        # partial pass: only the levels above target_level
        use = [stream.details[i] for i in range(max(lo, target_level), hi)]
        steps = tuple(_scaled_steps(stream, i + 1) for i in range(max(lo, target_level), hi))
        ch, cw = detail_spatial_shape(use[-1][0], len(use))
        x = x[..., :ch, :cw]
        x = idwt_multilevel_dequant_pallas(x, use, steps, recon_offset=recon_offset)
        hi = max(lo, target_level)
    x = _undo_color(stream, x)
    x = unpad(x, out_h, out_w)
    if emit_u8:
        x = _emit_native(stream, x)
    return x
