"""Reference module shim: wicca.config.aliases."""

from wicca_tpu.config.aliases import Depth, ModelClass, ModelsDict, ModelWithConfig  # noqa: F401
