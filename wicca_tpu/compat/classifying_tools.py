"""Reference module shim: wicca.classifying_tools."""

from wicca_tpu.harness.processor import ClassifierProcessor  # noqa: F401
from wicca_tpu.utils.env import is_jupyter, preserve_depth  # noqa: F401
from wicca_tpu.utils.timing import format_proc_time  # noqa: F401
