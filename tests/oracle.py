"""Numpy oracle for the reference HaarCoder numerical contract.

Clean-room derivation from SURVEY.md §2.3 (contract of
/root/reference/wicca/wavelet_coder.py:50-67 + data_loader.py:66-117): pad
bottom/right to a multiple of 2**depth, cast float32, per level sum row pairs
then column pairs and scale by 0.25 (fixed association), finally
clip(0,255).astype(uint8). Used to assert bit-exactness of the JAX paths.
"""

import numpy as np

_MODE_MAP = {"replicate": "edge", "constant": "constant", "reflect": "symmetric", "reflect101": "reflect", "wrap": "wrap"}


def oracle_pad(img: np.ndarray, ratio: int, mode: str = "replicate", constant: int = 0) -> np.ndarray:
    h, w = img.shape[:2]
    dr, dc = (-h) % ratio, (-w) % ratio
    if dr == 0 and dc == 0:
        return img
    pw = [(0, dr), (0, dc)] + [(0, 0)] * (img.ndim - 2)
    if mode == "constant":
        return np.pad(img, pw, mode="constant", constant_values=constant)
    return np.pad(img, pw, mode=_MODE_MAP[mode])


def oracle_icon(img_hwc: np.ndarray, depth: int, mode: str = "replicate", constant: int = 0) -> np.ndarray:
    """Reference icon for HWC uint8 input (contract SURVEY.md §2.3)."""
    ll = oracle_pad(img_hwc, 2**depth, mode, constant).astype(np.float32)
    for _ in range(depth):
        rows = ll[0::2] + ll[1::2]
        ll = (rows[:, 0::2] + rows[:, 1::2]) * np.float32(0.25)
    return np.clip(ll, 0, 255).astype(np.uint8)
