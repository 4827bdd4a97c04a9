"""Input normalization — parity with reference normalization.py:23-64."""

from __future__ import annotations

import logging
from pathlib import Path

from wicca_tpu.config.aliases import Depth


def normalize_depth(depth: Depth) -> tuple[int, ...]:
    """int | tuple | list | range -> tuple of positive ints (reference
    normalization.py:23-55 contract, same error messages semantics)."""
    if depth is None:
        raise ValueError("Depth must be provided")
    if isinstance(depth, int) and not isinstance(depth, bool) and depth > 0:
        depth = (depth,)
    if isinstance(depth, (tuple, list, range)):
        depth = tuple(depth)
    else:
        raise ValueError("Depth must be a positive integer, tuple, list, or range")
    if all(isinstance(x, int) and x > 0 for x in depth):
        return depth
    raise ValueError("All depths must be integers greater than 0")


def normalize_folder(folder: str | Path) -> Path:
    """str | Path -> Path (reference normalization.py:58-64)."""
    if not isinstance(folder, (Path, str)):
        msg = f"Invalid input type: {type(folder)}. Expected str or Path."
        logging.error(msg)
        raise TypeError(msg)
    return Path(folder)
