"""Reference module shim: wicca.data_loader."""

from wicca_tpu.data.loader import load_image  # noqa: F401
from wicca_tpu.models.registry import load_models, load_single_model  # noqa: F401


def get_padded_copy(image, ratio, border_type=1, border_constant=0):
    """HWC variant of core.pad.pad_to_multiple (reference data_loader.py:66)."""
    import numpy as np

    from wicca_tpu.core.pad import pad_to_multiple
    from wicca_tpu.data.loader import from_planar, to_planar

    return from_planar(np.asarray(pad_to_multiple(to_planar(image), ratio, border_type, border_constant)))
