#!/usr/bin/env python
"""Build an activation-parity fixture on a machine WITH tensorflow.

For each convertible architecture: runs the pretrained Keras model on a
fixed deterministic input batch and stores (input, logits) in one npz. The
offline test tests/test_convert_weights.py::test_activation_parity_fixture
then checks the converted Flax models reproduce those logits (bf16
tolerance) — making reference-weight parity verifiable the moment weights
reach an offline environment.

Usage (TF machine):
  python tools/make_parity_fixture.py fixtures.npz [arch ...]
  # also convert the weights alongside:
  python tools/convert_weights.py <arch> --fetch WEIGHTS_DIR

Then on the TPU machine:
  export WICCA_TPU_WEIGHTS=WEIGHTS_DIR WICCA_TPU_PARITY_FIXTURES=fixtures.npz
  python -m pytest tests/test_convert_weights.py -q
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from wicca_tpu.models.convert import _KERAS_FACTORIES, convertible_architectures


def main(argv) -> int:
    import importlib

    out_path = argv[0]
    archs = argv[1:] or list(convertible_architectures())
    rng = np.random.default_rng(0)
    # deterministic pseudo-image batch, raw [0,255] pixels; each arch's own
    # Keras preprocess_input is applied (mirrors registry PRE_INP roles)
    batch = rng.integers(0, 256, size=(4, 224, 224, 3)).astype(np.float32)
    store: dict[str, np.ndarray] = {"input": batch}
    for arch in archs:
        mod_name, cls_name = _KERAS_FACTORIES[arch]
        mod = importlib.import_module(mod_name)
        model = getattr(mod, cls_name)(weights="imagenet")
        # keras exposes preprocess_input next to each factory
        from tensorflow.keras.applications import (  # noqa: F401
            densenet, efficientnet, mobilenet_v2, nasnet, resnet, vgg16, vgg19,
        )
        pre = {
            "VGG16": vgg16.preprocess_input,
            "VGG19": vgg19.preprocess_input,
            "ResNet50": resnet.preprocess_input,
            "MobileNetV2": mobilenet_v2.preprocess_input,
            "EfficientNetB0": efficientnet.preprocess_input,
            "DenseNet121": densenet.preprocess_input,
            "NASNetMobile": nasnet.preprocess_input,
        }[arch]
        logits = model(pre(batch.copy())).numpy()
        store[f"logits_{arch}"] = logits
        print(f"{arch}: logits {logits.shape}, top1 {logits.argmax(-1)}")
    np.savez(out_path, **store)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
