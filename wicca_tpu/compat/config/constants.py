"""Reference module shim: wicca.config.constants."""

from wicca_tpu.config.constants import *  # noqa: F401,F403
