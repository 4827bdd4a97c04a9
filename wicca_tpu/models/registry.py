"""Classifier registry — explicit TPU-native replacement for the reference's
Keras-module reflection trick (/root/reference/wicca/data_loader.py:120-175;
SURVEY.md C11: "the reflection trick won't exist; build an explicit
registry").

``load_single_model`` / ``load_models`` return the same dict contract the
reference harness consumes: ``{MODEL, PRE_INP, DEC_PRED, SHAPE}``
(config/constants.py keys), where MODEL is a callable batch->logits. Models
are Flax modules jitted on the default backend (TPU when present); weights
resolve from ``WICCA_TPU_WEIGHTS/<name>.msgpack`` or fall back to
deterministic per-name init.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from wicca_tpu.config.aliases import ModelsDict
from wicca_tpu.config.constants import DEC_PRED, MODEL, PRE_INP, SHAPE
from wicca_tpu.models import flax_models
from wicca_tpu.models.imagenet import decode_predictions

# ---------------------------------------------------------------------------
# Preprocessing functions (per-architecture, matching the Keras conventions
# the reference picks up via reflection)
# ---------------------------------------------------------------------------


def preprocess_minus1_1(x: np.ndarray) -> np.ndarray:
    """[0,255] -> [-1,1] (Keras 'tf' mode: MobileNet/Inception families)."""
    return np.asarray(x, dtype=np.float32) / 127.5 - 1.0


def preprocess_caffe(x: np.ndarray) -> np.ndarray:
    """RGB->BGR + ImageNet mean subtraction (Keras 'caffe' mode: VGG/ResNet)."""
    x = np.asarray(x, dtype=np.float32)[..., ::-1]
    return x - np.array([103.939, 116.779, 123.68], dtype=np.float32)


def preprocess_torch(x: np.ndarray) -> np.ndarray:
    """[0,1] + ImageNet mean/std normalize (Keras 'torch' mode: EfficientNet+DenseNet)."""
    x = np.asarray(x, dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
    return (x - mean) / std


class JaxClassifier:
    """Callable classifier: ``model(batch_hwc_f32) -> logits np.ndarray``.

    Mirrors the reference's use of a Keras model object
    (classifying_tools.py:291-292: call then .numpy()) without TF.
    """

    def __init__(self, name: str, module, params, input_shape: tuple[int, int]):
        self.name = name
        self.module = module
        self.params = params
        self.input_shape = input_shape
        self._apply = jax.jit(lambda p, x: module.apply(p, x))

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply(self.params, jnp.asarray(batch, dtype=jnp.float32)))


_ARCHITECTURES: dict[str, tuple[Any, Any]] = {
    # name -> (flax module factory, preprocess fn)
    "MobileNetV2": (flax_models.MobileNetV2, preprocess_minus1_1),
    "ResNet50": (flax_models.ResNet50, preprocess_caffe),
    "EfficientNetB0": (flax_models.EfficientNetB0, preprocess_torch),
    "SimpleCNN": (flax_models.SimpleCNN, preprocess_minus1_1),
    "VGG16": (flax_models.VGG16, preprocess_caffe),
    "VGG19": (flax_models.VGG19, preprocess_caffe),
    "DenseNet121": (flax_models.DenseNet121, preprocess_torch),
    # checkpoint-faithful graph (nasnet_keras) so converted hosted weights
    # load; the paper-faithful variant stays importable as
    # flax_models.NASNetMobile
    "NASNetMobile": (flax_models.NASNetMobileKeras, preprocess_minus1_1),
    "ViTS16": (flax_models.ViTS16, preprocess_minus1_1),
    "ViTTiny16": (flax_models.ViTTiny16, preprocess_minus1_1),
}


def register_architecture(name: str, module_factory, preprocess) -> None:
    """Extension point for user model families."""
    _ARCHITECTURES[name] = (module_factory, preprocess)


def available_architectures() -> tuple[str, ...]:
    return tuple(_ARCHITECTURES)


def _init_params(name: str, module, shape: tuple[int, int]):
    weights_dir = os.environ.get("WICCA_TPU_WEIGHTS")
    if weights_dir:
        path = Path(weights_dir) / f"{name}.msgpack"
        if path.is_file():
            from flax import serialization

            dummy = jnp.zeros((1, *shape, 3), jnp.float32)
            target = module.init(jax.random.PRNGKey(0), dummy)
            with open(path, "rb") as f:
                return serialization.from_bytes(target, f.read())
        logging.warning(f"No weights file for {name} at {path}; using deterministic init")
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    dummy = jnp.zeros((1, *shape, 3), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), dummy)


def load_single_model(model_class, shape: tuple[int, int] = (224, 224), weights: str = "imagenet") -> dict | None:
    """Reference-parity loader (data_loader.py:120-147): returns the
    {MODEL, PRE_INP, DEC_PRED, SHAPE} dict or None on failure.

    ``model_class`` may be a registered architecture name, a flax Module
    class/factory from :mod:`wicca_tpu.models.flax_models`, or any callable
    returning logits (used as-is with default preprocessing).
    """
    try:
        import flax.linen as nn

        if isinstance(model_class, str):
            name = model_class
            factory, pre = _ARCHITECTURES[name]
            module = factory()
        else:
            name = getattr(model_class, "__name__", type(model_class).__name__)
            if name in _ARCHITECTURES:
                factory, pre = _ARCHITECTURES[name]
                module = factory()
            else:
                module = model_class() if isinstance(model_class, type) or callable(model_class) else model_class
                pre = preprocess_minus1_1
        if not isinstance(module, nn.Module):
            # duck-typed external model (e.g. a Keras model instance): use it
            # as the batch->logits callable directly; its own preprocess /
            # decode can be swapped in by the caller afterwards
            model = lambda batch, _m=module: np.asarray(_m(np.asarray(batch, dtype=np.float32)))
            return {MODEL: model, PRE_INP: pre, DEC_PRED: decode_predictions, SHAPE: shape}
        params = _init_params(name, module, shape)
        model = JaxClassifier(name, module, params, shape)
        return {MODEL: model, PRE_INP: pre, DEC_PRED: decode_predictions, SHAPE: shape}
    except Exception as e:  # noqa: BLE001  (reference contract: log + None)
        logging.error(f"Error loading: {e}")
        return None


def load_models(models: ModelsDict) -> dict[str, Any]:
    """Reference-parity multi-loader (data_loader.py:150-175): dict of name ->
    class or (class, kwargs), with progress bar."""
    from tqdm.auto import tqdm

    classifiers: dict[str, Any] = {}
    for name, info in tqdm(models.items(), desc="loading model zoo"):
        if isinstance(info, tuple):
            model_class, kwargs = info
        else:
            model_class, kwargs = info, {}
        classifiers[name] = load_single_model(model_class, **kwargs)
    return classifiers
