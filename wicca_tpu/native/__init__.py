"""Native (C++) host-side components — ctypes bindings with lazy build.

The shared library is built on first use with the in-tree Makefile (g++);
set ``WICCA_TPU_NO_NATIVE=1`` to force the pure-Python fallbacks.
"""

from wicca_tpu.native.rice import (  # noqa: F401
    native_available,
    rice_decode,
    rice_encode,
)
