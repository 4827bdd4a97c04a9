"""Reference module shim: wicca.validation."""

from wicca_tpu.data.validation import (  # noqa: F401
    validate_image,
    validate_input_folder,
    validate_output_folder,
)
