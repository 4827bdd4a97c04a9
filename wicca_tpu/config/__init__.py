from wicca_tpu.config import aliases, constants  # noqa: F401
