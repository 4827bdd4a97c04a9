"""Reference module shim: wicca.wavelet_coder (see wicca_tpu.coder)."""

from wicca_tpu.coder import HaarCoder, LiftingCoder, WaveletCoder  # noqa: F401
