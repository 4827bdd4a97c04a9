"""Small environment/UX helpers (reference C14 parity, SURVEY.md:
classifying_tools.py:49-70)."""

from __future__ import annotations

import functools
import sys


def is_jupyter() -> bool:
    """True inside a Jupyter kernel (reference classifying_tools.py:49-51)."""
    return "ipykernel" in sys.modules


def preserve_depth(method):
    """Save/restore ``self.depth`` around a method that mutates it during a
    depth sweep (reference classifying_tools.py:54-70)."""

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        saved = self.depth
        try:
            return method(self, *args, **kwargs)
        finally:
            self.depth = saved

    return wrapper
