"""True activation parity vs Keras, in-process (SURVEY.md C11; VERDICT r3
missing #1 "activation-parity fixture is not checked in").

TensorFlow IS available in this environment, so parity does not need a
pretrained download: build each keras.applications model with random
initialization, dump its weights in the legacy H5 layout the converter
reads, convert to Flax, and compare logits on the same preprocessed batch.
If the converted Flax model reproduces the Keras function for random
weights, it reproduces it for the pretrained ImageNet weights too (the
computation graph and weight mapping are weight-independent) — closing the
"same checkpoints drive the same conclusions" claim without network access.

Run lane: slowish (~2-4 min total, TF import dominates); deselect with
`-m "not tf_parity"`.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from wicca_tpu.models import convert as cw
from wicca_tpu.models import flax_models

pytestmark = pytest.mark.tf_parity

_PRE = {
    "VGG16": "vgg16",
    "VGG19": "vgg19",
    "ResNet50": "resnet",
    "MobileNetV2": "mobilenet_v2",
    "EfficientNetB0": "efficientnet",
    "DenseNet121": "densenet",
    "NASNetMobile": "nasnet",
}




# Keras 3 renamed a couple of layers relative to the hosted legacy H5
# checkpoints the schemas target (e.g. DenseNet "conv1/conv" -> "conv1_conv");
# translate live-model names back to the hosted-file names when dumping.
_LEGACY_RENAMES = {
    "DenseNet121": {"conv1_conv": "conv1/conv", "conv1_bn": "conv1/bn"},
}


def _legacy_h5_from_model(model, path, renames):
    """Write a live Keras model's weights in the LEGACY layer_names/H5
    layout (the format of the hosted keras.applications checkpoints, and
    what convert.read_keras_h5 parses — Keras 3's native .weights.h5 uses a
    different tree)."""
    with h5py.File(path, "w") as f:
        names = [renames.get(l.name, l.name) for l in model.layers if l.get_weights()]
        f.attrs["layer_names"] = [n.encode() for n in names]
        for layer in model.layers:
            arrs = layer.get_weights()
            if not arrs:
                continue
            name = renames.get(layer.name, layer.name)
            g = f.create_group(name)
            wnames = [f"{name}/w{i}:0" for i in range(len(arrs))]
            g.attrs["weight_names"] = [w.encode() for w in wnames]
            for w, a in zip(wnames, arrs):
                g.create_dataset(w, data=a)


@pytest.mark.parametrize("arch", sorted(cw.SCHEMAS))
def test_keras_random_weight_parity(arch, tmp_path):
    import importlib

    keras_apps = importlib.import_module("tensorflow.keras.applications")
    pre = getattr(importlib.import_module(
        f"tensorflow.keras.applications.{_PRE[arch]}"), "preprocess_input")
    tf.keras.utils.set_random_seed(0)
    kmodel = getattr(keras_apps, arch)(weights=None)
    if arch in ("EfficientNetB0", "NASNetMobile"):
        # random-init deep stacks collapse to near-uniform logits —
        # diversify every BN's stats so real graph deviations surface in
        # the comparison instead of hiding in the noise floor
        brng = np.random.default_rng(1)
        for layer in kmodel.layers:
            ws = layer.get_weights()
            if isinstance(layer, tf.keras.layers.BatchNormalization) and len(ws) == 4:
                g, b, m, v = ws
                layer.set_weights([
                    g * brng.uniform(0.8, 1.4, g.shape).astype(np.float32),
                    b + brng.normal(0, 0.3, b.shape).astype(np.float32),
                    m + brng.normal(0, 0.3, m.shape).astype(np.float32),
                    v * brng.uniform(0.6, 1.6, v.shape).astype(np.float32),
                ])
    h5 = tmp_path / f"{arch}.h5"
    _legacy_h5_from_model(kmodel, h5, _LEGACY_RENAMES.get(arch, {}))

    # float32 Flax instance (the zoo defaults to bfloat16 for TPU; parity
    # wants matched precision). VGG16/19 are factory functions returning a
    # configured VGG dataclass -> dtype via dataclasses.replace.
    import dataclasses as _dc

    module = _dc.replace(cw.flax_module_for(arch)(), dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    converted, report = cw.map_weights(arch, cw.read_keras_h5(h5), variables)
    assert report["unexpected_keras_layers"] == []

    rng = np.random.default_rng(42)
    batch = rng.integers(0, 256, size=(2, 224, 224, 3)).astype(np.float32)
    # each side gets ITS OWN preprocessing contract: Keras models may embed
    # normalization internally (EfficientNet: preprocess_input is identity),
    # the Flax zoo always takes the registry PRE_INP convention
    from wicca_tpu.models.registry import _ARCHITECTURES

    x_keras = np.asarray(pre(batch.copy()), dtype=np.float32)
    if arch == "EfficientNetB0":
        # weights=None leaves Keras's embedded Normalization layer at
        # identity (the ImageNet mean/var ship WITH the pretrained file, and
        # then match the registry's preprocess_torch) — so this random-init
        # parity run feeds the flax model the same x/255 the keras graph
        # effectively sees
        x_flax = batch.copy().astype(np.float32) / 255.0
    else:
        x_flax = np.asarray(_ARCHITECTURES[arch][1](batch.copy()), dtype=np.float32)
    want = np.asarray(kmodel(x_keras, training=False), dtype=np.float32)  # softmax probs
    logits = np.asarray(module.apply(converted, jnp.asarray(x_flax), train=False), dtype=np.float32)
    got = np.asarray(jax.nn.softmax(logits, axis=-1), dtype=np.float32)
    assert got.shape == want.shape == (2, 1000)
    # identical math up to conv-reduction reassociation
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)
    # ranking agreement (what the harness consumes)
    assert np.array_equal(got.argmax(-1), want.argmax(-1))
    top5_g = np.argsort(-got, axis=-1)[:, :5]
    top5_w = np.argsort(-want, axis=-1)[:, :5]
    for g, w in zip(top5_g, top5_w):
        assert len(set(g) & set(w)) >= 4


@pytest.mark.parametrize("arch", sorted(cw.SCHEMAS))
def test_parameter_counts_match_keras_exactly(arch):
    """Every schema architecture's Flax parameter count must EQUAL the
    Keras count (VERDICT r3 #4: param-count assertions for the zoo)."""
    import importlib

    keras_apps = importlib.import_module("tensorflow.keras.applications")
    kmodel = getattr(keras_apps, arch)(weights=None)
    # keras counts include non-checkpoint preprocessing state
    # (EfficientNet's Normalization mean/var); exclude those layers
    k_count = sum(
        int(np.prod(w.shape))
        for layer in kmodel.layers
        if not any(t in layer.name for t in cw._SKIP_LAYERS)
        for w in layer.get_weights()
    )
    module = cw.flax_module_for(arch)()
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    f_count = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables))
    assert f_count == k_count, f"{arch}: flax {f_count:,} vs keras {k_count:,}"
