"""Region-of-interest coding — the maxshift method (JPEG2000 Part 1 §H),
adapted to the deadzone code domain.

The reference has no notion of ROI (or of rate at all; SURVEY.md §0). This
implements the classic trade: spend fewer bits OUTSIDE a region of interest
while the region itself keeps full fidelity, without transmitting a mask.

``apply_roi(stream, mask, bg_shift=b)`` post-processes an encoded
:class:`~wicca_tpu.codec.pipeline.CodeStream`:

1. every *background* detail code loses its ``b`` lowest magnitude bits
   (sign-magnitude shift — exactly a ``2**b`` coarser deadzone quantizer);
2. every *ROI* code is scaled up by ``s`` bits, with
   ``2**s > max |background code|`` — so magnitude alone separates the two
   populations and the decoder needs no mask (the maxshift rule).

The decoder (codec.pipeline's normalization pre-pass) maps codes back:
``|c| >= 2**s`` -> ROI, exact ``>> s``; else background, midpoint ``<< b``.
ROI codes therefore decode bit-identically to the un-ROI'd stream, while
background quality drops by ~6.02*b dB — and the file shrinks, because
background planes dominate.

With SNR quality layers (container ``quality_layers``), the upshift also
reproduces maxshift's progressive semantics: truncating ``m`` layers costs
the background ``m`` magnitude bits but the ROI only ``max(0, m - s)`` —
the region of interest is what survives aggressive truncation.

The per-level code-domain masks are the pixel mask max-pooled by ``2**level``
and dilated by the wavelet's influence margin, so every coefficient whose
inverse-transform support touches the ROI is protected (haar is 2-tap
block-structured: margin 0; 5/3: 2 samples; cdf97/db2: 4).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from wicca_tpu.codec.pipeline import CodeStream

# per-level dilation (in subband samples) covering the inverse transform's
# influence radius; haar variants are block-structured (no spill)
_MARGINS = {"haar": 0, "haar_int": 0, "legall5.3": 2, "cdf53": 2}


def band_mask(mask: np.ndarray, sh: int, sw: int, level: int, margin: int) -> np.ndarray:
    """Pixel-space bool mask -> bool mask of a level-``level`` subband plane
    of stored extent ``(sh, sw)``: max-pool by ``2**level``, dilate by
    ``margin`` samples (Chebyshev), zero-fill any tile-padding extent."""
    m = np.asarray(mask, dtype=bool)
    f = 1 << level
    ph, pw = -(-m.shape[0] // f), -(-m.shape[1] // f)
    pad = np.zeros((ph * f, pw * f), bool)
    pad[: m.shape[0], : m.shape[1]] = m
    pooled = pad.reshape(ph, f, pw, f).any(axis=(1, 3))
    if margin:
        # separable dilation: rows then columns
        acc = pooled.copy()
        for d in range(1, margin + 1):
            acc[d:, :] |= pooled[:-d, :]
            acc[:-d, :] |= pooled[d:, :]
        pooled, acc = acc, acc.copy()
        for d in range(1, margin + 1):
            acc[:, d:] |= pooled[:, :-d]
            acc[:, :-d] |= pooled[:, d:]
        pooled = acc
    out = np.zeros((sh, sw), bool)
    ch, cw = min(sh, pooled.shape[0]), min(sw, pooled.shape[1])
    out[:ch, :cw] = pooled[:ch, :cw]
    return out


def apply_roi(
    stream: CodeStream,
    mask: np.ndarray,
    bg_shift: int = 2,
    margin: int | None = None,
) -> CodeStream:
    """Maxshift-ROI a CodeStream (host-level, like serialize — the shift
    amount depends on the data's background maximum).

    ``mask`` is an ``(H, W)`` bool array in pixel space (True = ROI).
    ``bg_shift`` in [0, 6]: background codes are quantized ``2**bg_shift``
    coarser (~6 dB per unit); 0 keeps background exact and only reorders
    bitplane priority for layered streams. ``margin`` overrides the
    per-wavelet influence dilation.

    Returns a new CodeStream (``roi_shift``/``bg_shift`` set, detail dtype
    widened to carry the upshifted codes). ``decode`` and friends handle the
    inverse transparently; serialize writes a WCT6 container.
    """
    if getattr(stream, "roi_shift", 0):
        raise ValueError("stream is already ROI-coded")
    if not 0 <= bg_shift <= 6:
        raise ValueError(f"bg_shift must be in [0, 6], got {bg_shift}")
    H, W = stream.orig_shape
    mask = np.asarray(mask, dtype=bool)
    if mask.shape != (H, W):
        raise ValueError(f"mask shape {mask.shape} != image {(H, W)}")
    if not mask.any():
        raise ValueError("ROI mask is empty")
    mg = _MARGINS.get(stream.wavelet, 4) if margin is None else margin
    planes = [[np.asarray(b) for b in bands] for bands in stream.details]
    masks = []
    max_bg = 0
    max_roi = 0
    for lvl0, bands in enumerate(planes):
        sh, sw = bands[0].shape[-2], bands[0].shape[-1]
        bm = band_mask(mask, sh, sw, lvl0 + 1, mg)
        masks.append(bm)
        for b in bands:
            m = np.abs(b.astype(np.int64))
            bg = m[..., ~bm] >> bg_shift
            if bg.size:
                max_bg = max(max_bg, int(bg.max(initial=0)))
            roi = m[..., bm]
            if roi.size:
                max_roi = max(max_roi, int(roi.max(initial=0)))
    s = max(1, int(max_bg).bit_length())  # 2**s > max |background|
    peak = max(max_roi << s, max_bg)
    dt = np.int16 if peak < (1 << 15) else np.int32
    new_details = []
    for bm, bands in zip(masks, planes):
        out_bands = []
        for b in bands:
            v = b.astype(np.int64)
            sg = np.sign(v)
            m = np.abs(v)
            out = np.where(bm, sg * (m << s), sg * (m >> bg_shift))
            out_bands.append(out.astype(dt))
        new_details.append(tuple(out_bands))
    return dataclasses.replace(
        stream, details=tuple(new_details), roi_shift=s, bg_shift=bg_shift
    )
