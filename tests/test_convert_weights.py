"""Keras -> Flax weight conversion (models/convert.py; SURVEY.md C11).

Offline strategy: build synthetic H5 files in the exact Keras weights-file
layout (layer_names / weight_names attrs, per-layer datasets) with the real
keras.applications layer names, convert, and check every leaf landed where
the schema says (values + depthwise transpose + BN split), the registry
loads the msgpack, and coverage errors fire loudly. True activation parity
vs pretrained checkpoints is pinned by test_activation_parity_fixture, which
runs whenever a fixture built by tools/make_parity_fixture.py is present
(env WICCA_TPU_PARITY_FIXTURES + WICCA_TPU_WEIGHTS).
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wicca_tpu.models import convert as cw
from wicca_tpu.models import flax_models

h5py = pytest.importorskip("h5py")


def _template(arch):
    module = cw.flax_module_for(arch)()
    return module, module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))


def _keras_arrays(variables, fpath, kind, rng):
    """Random Keras-layout arrays matching a flax param group."""
    params = variables["params"]
    node = params
    for k in fpath:
        node = node[k]
    if kind == cw.BN:
        stats = variables["batch_stats"]
        for k in fpath:
            stats = stats[k]
        c = node["scale"].shape[0]
        return [rng.normal(size=(c,)).astype(np.float32) for _ in range(3)] + [
            rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)
        ]
    if kind == cw.SEPCONV:
        dw = np.asarray(node["Conv_0"]["kernel"])  # (kh, kw, 1, C)
        pw = np.asarray(node["Conv_1"]["kernel"])  # (1, 1, C, F)
        return [
            rng.normal(size=np.transpose(dw, (0, 1, 3, 2)).shape).astype(np.float32),
            rng.normal(size=pw.shape).astype(np.float32),
        ]
    kernel = np.asarray(node["kernel"])
    if kind == cw.DWCONV:
        arrs = [rng.normal(size=np.transpose(kernel, (0, 1, 3, 2)).shape).astype(np.float32)]
    else:
        arrs = [rng.normal(size=kernel.shape).astype(np.float32)]
    if "bias" in node:
        arrs.append(rng.normal(size=node["bias"].shape).astype(np.float32))
    return arrs


def _write_keras_h5(path, layers: dict[str, list[np.ndarray]], extra_attr_root=None):
    with h5py.File(path, "w") as f:
        root = f.create_group(extra_attr_root) if extra_attr_root else f
        root.attrs["layer_names"] = [n.encode() for n in layers]
        for name, arrs in layers.items():
            g = root.create_group(name)
            wnames = [f"{name}/w{i}:0" for i in range(len(arrs))]
            g.attrs["weight_names"] = [w.encode() for w in wnames]
            for w, a in zip(wnames, arrs):
                g.create_dataset(w, data=a)


def _build_synthetic(arch, tmp_path, extra_layers=(), root=None):
    module, variables = _template(arch)
    rng = np.random.default_rng(7)
    layers = {}
    for kname, fpath, kind in cw.SCHEMAS[arch]():
        layers[kname] = _keras_arrays(variables, fpath, kind, rng)
    for name, arrs in extra_layers:
        layers[name] = arrs
    h5 = tmp_path / f"{arch}.h5"
    _write_keras_h5(h5, layers, extra_attr_root=root)
    return module, variables, layers, h5


# Big-graph init/apply costs 45-200s each on this 2-core CPU; the default
# lane keeps two representative architectures and the rest run in the slow
# lane — conversion for ALL seven is covered more strongly by the
# tf_parity activation-parity lane anyway.
_FAST_ROUNDTRIP = {"MobileNetV2", "ResNet50"}


@pytest.mark.parametrize(
    "arch",
    [
        a if a in _FAST_ROUNDTRIP else pytest.param(a, marks=pytest.mark.slow)
        for a in sorted(cw.SCHEMAS)
    ],
)
def test_convert_roundtrip_every_leaf(arch, tmp_path):
    """Every flax leaf gets the schema-designated keras array (values exact,
    depthwise transposed, BN split across params/batch_stats)."""
    module, variables, layers, h5 = _build_synthetic(arch, tmp_path)
    out = cw.convert_h5(arch, h5, tmp_path / "weights")
    from flax import serialization

    got = serialization.from_bytes(variables, out.read_bytes())
    for kname, fpath, kind in cw.SCHEMAS[arch]():
        node = got["params"]
        for k in fpath:
            node = node[k]
        arrs = layers[kname]
        if kind == cw.BN:
            stats = got["batch_stats"]
            for k in fpath:
                stats = stats[k]
            np.testing.assert_array_equal(np.asarray(node["scale"]), arrs[0])
            np.testing.assert_array_equal(np.asarray(node["bias"]), arrs[1])
            np.testing.assert_array_equal(np.asarray(stats["mean"]), arrs[2])
            np.testing.assert_array_equal(np.asarray(stats["var"]), arrs[3])
        elif kind == cw.SEPCONV:
            np.testing.assert_array_equal(
                np.asarray(node["Conv_0"]["kernel"]), np.transpose(arrs[0], (0, 1, 3, 2))
            )
            np.testing.assert_array_equal(np.asarray(node["Conv_1"]["kernel"]), arrs[1])
        else:
            want = arrs[0]
            if kind == cw.DWCONV:
                want = np.transpose(want, (0, 1, 3, 2))
            np.testing.assert_array_equal(np.asarray(node["kernel"]), want)
            if "bias" in node:
                np.testing.assert_array_equal(np.asarray(node["bias"]), arrs[1])


def test_registry_loads_converted_weights(tmp_path, monkeypatch):
    """WICCA_TPU_WEIGHTS/<name>.msgpack actually drives the classifier."""
    arch = "MobileNetV2"
    module, variables, layers, h5 = _build_synthetic(arch, tmp_path)
    cw.convert_h5(arch, h5, tmp_path / "weights")
    monkeypatch.setenv("WICCA_TPU_WEIGHTS", str(tmp_path / "weights"))
    from wicca_tpu.models.registry import load_single_model

    info = load_single_model(arch, shape=(224, 224))
    assert info is not None
    from wicca_tpu.config.constants import MODEL

    clf = info[MODEL]
    kern = np.asarray(clf.params["params"]["_ConvBN_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(kern, layers["Conv1"][0])
    logits = clf(np.zeros((1, 224, 224, 3), np.float32))
    assert logits.shape == (1, 1000) and np.isfinite(logits).all()


def test_model_weights_subgroup_and_skip_layers(tmp_path):
    """Full-model H5s nest under model_weights/; preprocessing layers
    (EfficientNet rescaling/normalization) are skipped with a report."""
    arch = "EfficientNetB0"
    extra = (
        ("rescaling", [np.float32(1 / 255.0)]),
        ("normalization", [np.zeros(3, np.float32), np.ones(3, np.float32), np.int64(0)]),
    )
    module, variables, layers, h5 = _build_synthetic(arch, tmp_path, extra_layers=extra, root="model_weights")
    keras_weights = cw.read_keras_h5(h5)
    tree, report = cw.map_weights(arch, keras_weights, variables)
    assert sorted(report["skipped_preprocessing"]) == ["normalization", "rescaling"]
    assert report["unexpected_keras_layers"] == []


def test_wrong_architecture_fails_loudly(tmp_path):
    module, variables, layers, h5 = _build_synthetic("VGG16", tmp_path)
    # VGG16's file shares only "predictions" with ResNet50's schema, so the
    # first loud failure may be either the missing-layers or the shape check
    with pytest.raises(ValueError, match="missing layers|shape mismatch"):
        cw.map_weights("ResNet50", cw.read_keras_h5(h5), _template("ResNet50")[1])
    # shape mismatch: right names, wrong sizes
    _, r50_vars = _template("ResNet50")
    kw = cw.read_keras_h5(h5)
    kw_bad = {k: v for k, v in kw.items()}
    names = {s[0] for s in cw.SCHEMAS["ResNet50"]()}
    for n in names:
        kw_bad.setdefault(n, [np.zeros((1, 1, 1, 1), np.float32)])
    with pytest.raises(ValueError, match="shape mismatch|expected 4 BN"):
        cw.map_weights("ResNet50", kw_bad, r50_vars)


def test_coverage_check_catches_missing_modules():
    """A schema that misses flax modules must not silently half-load."""
    arch = "VGG16"
    _, variables = _template(arch)
    rng = np.random.default_rng(3)
    partial_schema = cw.SCHEMAS[arch]()[:-1]  # drop predictions
    kweights = {}
    for kname, fpath, kind in partial_schema:
        kweights[kname] = _keras_arrays(variables, fpath, kind, rng)
    full = cw.SCHEMAS[arch]
    cw.SCHEMAS[arch] = lambda: partial_schema
    try:
        with pytest.raises(ValueError, match="not covered"):
            cw.map_weights(arch, kweights, variables)
    finally:
        cw.SCHEMAS[arch] = full


@pytest.mark.skipif(
    not (os.environ.get("WICCA_TPU_PARITY_FIXTURES") and os.environ.get("WICCA_TPU_WEIGHTS")),
    reason="needs fixture npz (tools/make_parity_fixture.py) + converted weights",
)
def test_activation_parity_fixture():
    """Converted pretrained weights reproduce stored Keras logits (bf16-level
    tolerance). Runs the moment real weights + fixture reach this machine."""
    from wicca_tpu.config.constants import MODEL, PRE_INP
    from wicca_tpu.models.registry import load_single_model

    data = np.load(os.environ["WICCA_TPU_PARITY_FIXTURES"])
    batch = data["input"]
    checked = 0
    for key in data.files:
        if not key.startswith("logits_"):
            continue
        arch = key[len("logits_"):]
        want = data[key]
        info = load_single_model(arch, shape=(224, 224))
        assert info is not None
        got = info[MODEL](info[PRE_INP](batch.copy()))
        # bf16 matmuls + fp32 keras: match top-1 everywhere and logits loosely
        assert (got.argmax(-1) == want.argmax(-1)).all(), arch
        np.testing.assert_allclose(got, want, rtol=0.1, atol=0.5, err_msg=arch)
        checked += 1
    assert checked > 0
