"""Reference module shim: wicca.normalization."""

from wicca_tpu.data.normalization import normalize_depth, normalize_folder  # noqa: F401
