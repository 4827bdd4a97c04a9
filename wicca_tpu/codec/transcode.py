"""Stream transcoding: rewrite a ``.wct`` file without re-running the DWT.

JPEG2000's killer operational feature is that codestreams can be *reshaped*
by a middlebox — drop quality layers, drop resolution levels, repack with a
different entropy codec — without touching the wavelet transform. The
reference has no codec at all (SURVEY.md §0: icons only); this module gives
the ``.wct`` format the same property:

* ``max_layers`` — keep a prefix of an SNR-layered stream (coarser step).
* ``drop_levels`` — drop the finest r detail levels: the result is a valid
  stream of the 1/2**r-resolution image, decoding exactly like
  ``decode_at_level(orig, r)``.
* ``codec`` / ``quality_layers`` — re-entropy-code (e.g. rice -> rc, or
  re-layer a flat stream for progressive transmission).

Everything happens on host codes (entropy decode -> reshape -> entropy
encode); the TPU is never touched.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from wicca_tpu.codec.pipeline import CodeStream


def drop_finest_levels(stream: CodeStream, r: int) -> CodeStream:
    """Drop the finest ``r`` detail levels: a depth-(L-r) stream of the
    1/2**r-resolution image. Decodes exactly like ``decode_at_level(s, r)``.

    Quantization steps follow the level shift (old level l becomes new level
    l-r, so ``base_step`` absorbs ``level_gain**r``). Only geometry-free
    transforms can be re-rooted this way: Haar variants (2-tap — tile
    boundaries are invisible) and ``layout='global'`` lifting streams. Wide
    tile-local streams (legall5.3 / bior4.4 on >1 tile) would need the
    encoder's pass-aligned tile grid, so they are rejected — use
    ``decode_at_level`` instead."""
    if not 0 <= r < stream.levels:
        raise ValueError(f"drop_levels must be in [0, {stream.levels - 1}], got {r}")
    if r == 0:
        return stream
    if stream.layout == "tiled" and stream.wavelet not in ("haar", "haar_int"):
        raise ValueError(
            f"cannot re-root a tiled {stream.wavelet!r} stream (tile grids are "
            "pass-aligned); decode_at_level() instead"
        )
    from wicca_tpu.ops import dwt_pallas

    if dwt_pallas._T_LVLS:  # pragma: no cover - _T_LVLS is 0 (PERFORMANCE.md)
        raise NotImplementedError("level drop with transposed detail storage")
    h, w = stream.orig_shape
    scale = 1 << r
    spec = dataclasses.replace(
        stream.spec, base_step=stream.spec.base_step * stream.spec.level_gain**r
    )
    band_div = getattr(stream, "band_div", ())
    return dataclasses.replace(
        stream,
        details=stream.details[r:],
        levels=stream.levels - r,
        orig_shape=(-(-h // scale), -(-w // scale)),
        spec=spec,
        # R-D divisor table indexes planes fine->coarse: drop with the levels
        band_div=band_div[3 * r :] if band_div else (),
    )


def transcode(
    src: str | Path,
    dst: str | Path,
    max_layers: int | None = None,
    drop_levels: int = 0,
    codec: str = "auto",
    quality_layers: int | None = None,
    threads: int = 8,
    allow_truncated: bool = False,
    on_error: str = "raise",
    ll_codec: str = "raw",
    ll_step: float = 0.125,
) -> dict:
    """Rewrite ``src`` -> ``dst`` applying layer truncation, level drops, and
    entropy-codec/layering changes. Returns size metrics.

    ``quality_layers=None`` (default) preserves the source's SNR layering
    (after ``max_layers`` truncation), so a codec-only rewrite of a layered
    stream stays progressive; pass an int to re-layer explicitly.

    ``ll_codec`` rewrites the LL storage (WCT10): 'rice' losslessly packs
    integer LLs of existing archives; 'quant' quantizes float LLs at
    ``ll_step``. A loaded WCT10 stream re-saves raw unless asked again
    (the in-memory LL is already materialized)."""
    from wicca_tpu.codec.container import load, peek_layers, save

    src, dst = Path(src), Path(dst)
    if quality_layers is None:
        quality_layers = peek_layers(str(src))
        if max_layers is not None:
            quality_layers = max(1, min(quality_layers, max_layers))
    stream = load(str(src), threads=threads, max_layers=max_layers,
                  allow_truncated=allow_truncated, on_error=on_error)
    stream = drop_finest_levels(stream, drop_levels)
    bytes_out = save(stream, str(dst), threads=threads, codec=codec,
                     quality_layers=quality_layers, ll_codec=ll_codec, ll_step=ll_step)
    bytes_in = src.stat().st_size
    return {
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "ratio": round(bytes_in / max(bytes_out, 1), 3),
        "levels": stream.levels,
        "orig_shape": tuple(stream.orig_shape),
    }
