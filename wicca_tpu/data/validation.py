"""Folder / image validation — parity with reference validation.py, made
headless-safe.

Differences from the reference, on purpose (SURVEY.md §2.4 quirks):
* ``validate_output_folder`` never blocks on interactive ``input()``
  (reference validation.py:71-75 prompts when the folder is non-empty —
  hostile to CI). Overwrite policy is an explicit ``overwrite`` flag.
* empty input folder raises instead of ``sys.exit(1)`` (reference :60).
"""

from __future__ import annotations

import logging
import numpy as np
from pathlib import Path

from wicca_tpu.data.normalization import normalize_folder


def _handle_folder_errors(folder: str | Path, ftype: str = "data") -> Path:
    folder = normalize_folder(folder)
    if not folder.exists():
        if ftype == "data":
            msg = f"Provided {ftype} folder: '{folder}' does not exist."
            logging.error(msg)
            raise FileNotFoundError(msg)
        logging.warning(f"Provided {ftype} folder: '{folder}' does not exist. Creating folder...")
        folder.mkdir(parents=True, exist_ok=True)
    if not folder.is_dir():
        msg = f"Provided {ftype} folder: '{folder}' is not a directory."
        logging.error(msg)
        raise NotADirectoryError(msg)
    try:
        next(folder.iterdir(), None)
    except PermissionError:
        msg = f"Provided {ftype} folder: '{folder}' is not accessible."
        logging.error(msg)
        raise
    return folder


def validate_input_folder(folder: str | Path, ftype: str = "data") -> Path:
    folder = _handle_folder_errors(folder, ftype)
    if not any(folder.iterdir()):
        raise ValueError(f"The folder '{folder}' is empty. Please provide a non-empty folder.")
    return folder


def validate_output_folder(folder: str | Path, ftype: str = "result", overwrite: bool = True) -> Path:
    folder = _handle_folder_errors(folder, ftype)
    if any(folder.iterdir()):
        if not overwrite:
            raise FileExistsError(
                f"The folder '{folder}' is not empty and overwrite=False. "
                "Pass overwrite=True (default) to allow overwriting result CSVs."
            )
        logging.warning(f"The folder '{folder}' is not empty. Some files may be overwritten.")
    return folder


def validate_image(image) -> None:
    """uint8, non-empty ndarray (reference validation.py:80-101 contract)."""
    if image is None:
        raise ValueError("Image not found. Please check your input.")
    if getattr(image, "size", 0) == 0 or image.shape[0] == 0 or image.shape[1] == 0:
        raise ValueError("Image is empty")
    if image.dtype != np.uint8:
        raise ValueError("Image must be of type uint8")
