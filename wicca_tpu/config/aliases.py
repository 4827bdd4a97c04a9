"""Type aliases for the public API (parity with reference config/aliases.py:1-8)."""

from collections.abc import Callable
from typing import Any

ModelClass = Callable
ModelWithConfig = tuple[ModelClass, dict[str, Any]]
ModelsDict = dict[str, "ModelClass | ModelWithConfig"]
Depth = int | tuple[int, ...] | list[int] | range
