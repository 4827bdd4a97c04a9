"""Public-API type aliases.

Parity note: the reference exposes ``ModelClass`` / ``ModelWithConfig`` /
``ModelsDict`` / ``Depth`` from ``wicca/config/aliases.py`` (SURVEY.md §2.1
C12); the same names are re-exported here (and via ``wicca_tpu.compat``) so
reference call-sites type-check unchanged.  The definitions are written for
this framework: ``DepthSpec`` is the canonical name used internally, with
``Depth`` kept as the compat spelling.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any, TypeAlias, Union

#: Anything accepted as a transform-depth argument.  A bare ``int`` means one
#: depth; any iterable of ints (tuple/list/range) means a depth sweep.
#: Normalised to ``tuple[int, ...]`` by ``wicca_tpu.data.normalize_depth``.
DepthSpec: TypeAlias = Union[int, tuple[int, ...], list[int], range]

#: Compat spelling used by the reference API surface.
Depth: TypeAlias = DepthSpec

#: A zero-arg-constructible classifier factory (a Flax-zoo entry, a Keras
#: class, or any callable returning a model object).
ModelClass: TypeAlias = Callable

#: ``(factory, options)`` — options dict may carry ``{"shape": (h, w)}`` etc.
ModelWithConfig: TypeAlias = tuple[ModelClass, dict[str, Any]]

#: Registry input for ``wicca_tpu.models.load_models``:
#: display name -> factory, or -> (factory, options).
ModelsDict: TypeAlias = dict[str, Union[ModelClass, ModelWithConfig]]

#: Filesystem locations accepted throughout the data layer.
PathLike: TypeAlias = Union[str, os.PathLike]

__all__ = [
    "Depth",
    "DepthSpec",
    "ModelClass",
    "ModelWithConfig",
    "ModelsDict",
    "PathLike",
]
