from wicca_tpu.models.registry import (
    JaxClassifier,
    available_architectures,
    load_models,
    load_single_model,
    register_architecture,
)
