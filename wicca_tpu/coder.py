"""Coder classes — drop-in parity with the reference's WaveletCoder/HaarCoder
API (/root/reference/wicca/wavelet_coder.py:26-67; SURVEY.md C1/C2).

Reference users subclass WaveletCoder and call
``coder.get_small_copy(image_hwc_u8, depth, border_type, border_constant)``.
Here HaarCoder routes to the TPU icon path (bit-exact vs the reference
contract) and LiftingCoder exposes every registered lifting wavelet through
the same interface; both accept cv2 BORDER_* enums or mode strings.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from wicca_tpu.core.pad import normalize_border_mode
from wicca_tpu.data.validation import validate_image


class WaveletCoder(ABC):
    """Abstract image compressor based on multi-resolution analysis."""

    @abstractmethod
    def get_small_copy(
        self,
        image: np.ndarray,
        transform_depth: int,
        border_type=1,  # cv2.BORDER_REPLICATE
        border_constant: int = 0,
    ) -> np.ndarray:
        """Resize the image using a wavelet transform (HWC uint8 -> HWC uint8)."""


class HaarCoder(WaveletCoder):
    """Reference-parity Haar LL icon extractor, TPU-accelerated.

    Bit-exact vs the reference HaarCoder (SURVEY.md §2.3) for every depth and
    border mode; unlike the reference it also accepts 2-D grayscale input.
    """

    def get_small_copy(self, image, transform_depth, border_type=1, border_constant=0):
        import jax

        from wicca_tpu.core.haar import haar_icon
        from wicca_tpu.data.loader import from_planar, to_planar
        from wicca_tpu.ops.dwt_pallas import icon_pallas

        validate_image(image)
        mode = normalize_border_mode(border_type)
        planar = to_planar(image)
        fn = icon_pallas if jax.default_backend() == "tpu" else haar_icon
        icon = np.asarray(fn(planar, transform_depth, mode=mode, constant=border_constant))
        return from_planar(icon)


class LiftingCoder(WaveletCoder):
    """Icon via any registered lifting wavelet's LL branch (db2, bior4.4,
    haar_int, or user wavelets via core.lifting.register_wavelet)."""

    def __init__(self, wavelet: str = "bior4.4"):
        from wicca_tpu.core.lifting import lifting_wavelets

        if wavelet not in lifting_wavelets():
            raise ValueError(f"Unknown wavelet {wavelet!r}; have {sorted(lifting_wavelets())}")
        self.wavelet = wavelet

    def get_small_copy(self, image, transform_depth, border_type=1, border_constant=0):
        from wicca_tpu.core.lifting import dwt2_lifting
        from wicca_tpu.data.loader import from_planar, to_planar

        validate_image(image)
        mode = normalize_border_mode(border_type)
        pyr = dwt2_lifting(to_planar(image), transform_depth, self.wavelet, mode=mode, constant=border_constant)
        ll = np.asarray(pyr.ll)
        return from_planar(np.clip(ll, 0, 255).astype(np.uint8))
