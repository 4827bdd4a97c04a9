"""wicca_tpu — a TPU-native wavelet image codec + classification-analysis engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of Todmount/wicca
(see SURVEY.md): multi-level 2-D DWT/IDWT (Haar float + lossless integer
lifting, db2, bior4.4), LL-subband icon extraction bit-exact vs the reference
HaarCoder, coefficient quantization, Pallas TPU kernels, multi-device tiled
transforms with halo exchange, and a CNN comparison harness with CSV/plot
parity.

Subpackages (import lazily to keep `import wicca_tpu` light):
  core      pure-jnp transforms, padding, quantization, metrics
  ops       Pallas TPU kernels
  parallel  mesh / sharding / tiled multi-device transforms
  data      host-side image IO, validation, normalization
  models    Flax classifier zoo + registry
  harness   ClassifierProcessor-equivalent comparison engine
  analysis  result persistence & cross-run comparison (CSV contract)
  viz       plots (heatmap / radar / scatter / icon previews)
"""

from wicca_tpu.core import (  # noqa: F401
    Pyramid,
    QuantSpec,
    dwt2,
    dwt2_lifting,
    haar_icon,
    idwt2,
    idwt2_lifting,
    psnr,
)

__version__ = "0.1.0"
