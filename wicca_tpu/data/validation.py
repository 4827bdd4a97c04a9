"""Image and folder validation.

Behavioral contract (SURVEY.md C9, reference ``validation.py``): images must
be non-None, non-empty, uint8; input folders must exist, be directories,
be readable, and be non-empty; output folders are created on demand.
Deliberate redesigns vs the reference (SURVEY.md §2.4 quirks):

* headless-safe — a non-empty results folder never blocks on interactive
  ``input()``; overwrite policy is the explicit ``overwrite`` flag.
* an empty input folder raises ``ValueError`` instead of ``sys.exit(1)``.

Implementation and messages are original (clean-room: the GPL reference's
wording is deliberately not reproduced).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from wicca_tpu.data.normalization import normalize_folder

log = logging.getLogger(__name__)


def _require_readable_dir(folder: Path, role: str) -> None:
    if not folder.is_dir():
        # distinguish "missing" from "present but not a directory"
        if not folder.exists():
            msg = f"no such {role} folder: {folder}"
            log.error(msg)
            raise FileNotFoundError(msg)
        msg = f"{role} path {folder} exists but is not a directory"
        log.error(msg)
        raise NotADirectoryError(msg)
    if not os.access(folder, os.R_OK | os.X_OK):
        msg = f"cannot read {role} folder {folder} (permission denied)"
        log.error(msg)
        raise PermissionError(msg)


def validate_input_folder(folder: str | Path, ftype: str = "data") -> Path:
    """Resolve and check a folder we read from: exists, dir, readable, non-empty."""
    folder = normalize_folder(folder)
    _require_readable_dir(folder, ftype)
    if next(folder.iterdir(), None) is None:
        raise ValueError(f"{ftype} folder {folder} contains no files")
    return folder


def validate_output_folder(folder: str | Path, ftype: str = "result", overwrite: bool = True) -> Path:
    """Resolve and check a folder we write to, creating it when absent.

    With ``overwrite=False`` a non-empty folder raises ``FileExistsError``;
    otherwise a warning is logged and existing files may be replaced.
    """
    folder = normalize_folder(folder)
    if not folder.exists():
        log.info("creating %s folder %s", ftype, folder)
        folder.mkdir(parents=True, exist_ok=True)
    _require_readable_dir(folder, ftype)
    if next(folder.iterdir(), None) is not None:
        if not overwrite:
            raise FileExistsError(
                f"{ftype} folder {folder} already has contents; pass overwrite=True to reuse it"
            )
        log.warning("%s folder %s already has contents; files may be replaced", ftype, folder)
    return folder


def validate_image(image) -> None:
    """Require a non-None, non-empty uint8 ndarray (SURVEY.md C9 contract)."""
    if image is None:
        raise ValueError("expected an image array, got None (did loading fail?)")
    shape = getattr(image, "shape", ())
    if getattr(image, "size", 0) == 0 or (len(shape) >= 2 and min(shape[:2]) == 0):
        raise ValueError("image has zero pixels")
    if getattr(image, "dtype", None) != np.uint8:
        raise ValueError(f"image dtype must be uint8, got {getattr(image, 'dtype', type(image))}")
