"""Reference-namespace compatibility shim (SURVEY.md §2.5 public surface).

Code written against the reference imports like ``from wicca.wavelet_coder
import HaarCoder``; pointing those at ``wicca_tpu.compat`` makes the same
statements work against this framework:

    import wicca_tpu.compat as wicca
    from wicca_tpu.compat.wavelet_coder import HaarCoder

Each submodule re-exports the contract-equivalent implementation; no
reference code is vendored.
"""

from wicca_tpu.compat import (  # noqa: F401
    classifying_tools,
    data_loader,
    normalization,
    result_manager,
    validation,
    visualization,
    wavelet_coder,
)
