from wicca_tpu.compat.config import aliases, constants  # noqa: F401
