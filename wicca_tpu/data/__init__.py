from wicca_tpu.data.loader import from_planar, iter_decoded, list_images, load_image, to_planar
from wicca_tpu.data.normalization import normalize_depth, normalize_folder
from wicca_tpu.data.validation import validate_image, validate_input_folder, validate_output_folder
from wicca_tpu.models.registry import load_models, load_single_model  # noqa: F401  (reference data_loader parity)
