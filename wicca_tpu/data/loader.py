"""Host-side image IO and batching (reference data_loader.py:31-117 parity,
plus the pipelined loader the reference lacks).

The reference's hot loop decodes + transforms every image per classifier per
depth on one thread (SURVEY.md §3.2). Here decode happens once, on a thread
pool, overlapped with device compute (double-buffered prefetch): the TPU-
native pipeline-parallel stage of SURVEY.md §2.2 (PP row).

Layouts: host images are HWC uint8 (decode-native); device arrays are planar
``(C, H, W)`` so W rides the TPU lane dimension. ``to_planar``/``from_planar``
convert.
"""

from __future__ import annotations

import concurrent.futures
import logging
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from wicca_tpu.data.validation import validate_image

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}


def load_image(file_path: str | Path) -> np.ndarray | None:
    """Decode an image to RGB (HWC uint8); None on failure (reference
    data_loader.py:31-63 contract: empty path raises, bad file -> None)."""
    if not str(file_path):
        raise ValueError("refusing to load from an empty path")
    try:
        import cv2

        image = cv2.imread(str(file_path))
        validate_image(image)
        if image.ndim == 3:
            return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        return image
    except ImportError:
        try:
            from PIL import Image

            with Image.open(file_path) as im:
                return np.asarray(im.convert("RGB"))
        except Exception as e:  # noqa: BLE001
            logging.error(f"Error loading image {file_path}: {e}")
            return None
    except Exception as e:  # noqa: BLE001
        logging.error(f"Error loading image {file_path}: {e}")
        return None


def load_image_raw(file_path: str | Path, keep_alpha: bool = False) -> np.ndarray | None:
    """Decode an image preserving its stored bit depth (HWC RGB or HW gray;
    uint16 for 16-bit PNG/TIFF) — the hi-depth codec's input path. Unlike
    :func:`load_image` (reference uint8 contract), no dtype coercion happens;
    ``keep_alpha`` returns RGBA for 4-channel sources instead of dropping the
    alpha plane. None on failure."""
    if not str(file_path):
        raise ValueError("refusing to load from an empty path")
    try:
        import cv2

        image = cv2.imread(str(file_path), cv2.IMREAD_UNCHANGED)
        if image is None:
            raise ValueError("cv2.imread returned None")
        if image.ndim == 3 and image.shape[2] == 4 and keep_alpha:
            image = cv2.cvtColor(image, cv2.COLOR_BGRA2RGBA)
        elif image.ndim == 3 and image.shape[2] >= 3:
            # drop alpha, BGR -> RGB
            image = cv2.cvtColor(image[..., :3], cv2.COLOR_BGR2RGB)
        return image
    except Exception as e:  # noqa: BLE001
        logging.error(f"Error loading image {file_path}: {e}")
        return None


def list_images(folder: str | Path) -> list[Path]:
    """Sorted image files in a folder, filtered by extension (fixes the
    reference's unfiltered os.listdir crash, SURVEY.md §2.4 quirk 1)."""
    folder = Path(folder)
    return sorted(p for p in folder.iterdir() if p.suffix.lower() in IMAGE_EXTENSIONS and p.is_file())


def to_planar(image_hwc: np.ndarray) -> np.ndarray:
    """HWC (or HW) -> planar CHW for the device transform path."""
    if image_hwc.ndim == 2:
        return image_hwc[None]
    return np.ascontiguousarray(np.moveaxis(image_hwc, -1, 0))


def from_planar(image_chw: np.ndarray) -> np.ndarray:
    """Planar CHW -> HWC (squeezes a single channel to HW)."""
    if image_chw.ndim == 3 and image_chw.shape[0] == 1:
        return image_chw[0]
    return np.moveaxis(image_chw, 0, -1)


def iter_decoded(
    paths: Iterable[str | Path],
    num_threads: int = 8,
    prefetch: int = 2,
) -> Iterator[tuple[Path, np.ndarray | None]]:
    """Yield (path, HWC image or None) with a threaded decode pipeline.

    Decoding runs ``num_threads`` wide, ``prefetch`` batches ahead of the
    consumer, keeping the device fed (the reference decodes synchronously in
    its classify loop, classifying_tools.py:297-323).
    """
    paths = [Path(p) for p in paths]
    if not paths:
        return
    with concurrent.futures.ThreadPoolExecutor(max_workers=num_threads) as pool:
        futures: dict[int, concurrent.futures.Future] = {}
        window = max(1, num_threads * max(1, prefetch))
        for i, p in enumerate(paths[:window]):
            futures[i] = pool.submit(load_image, p)
        for i, p in enumerate(paths):
            nxt = i + window
            if nxt < len(paths):
                futures[nxt] = pool.submit(load_image, paths[nxt])
            yield p, futures.pop(i).result()
