"""Model zoo smoke tests: every registered architecture builds and produces
finite logits of the right shape."""

import numpy as np
import pytest

from wicca_tpu.config.constants import MODEL, PRE_INP
from wicca_tpu.models.registry import (
    available_architectures,
    load_single_model,
    register_architecture,
)

# one representative per family keeps the CPU suite fast; VGG19/ResNet50/
# EfficientNetB0 share building blocks with the tested three
ARCHS = [
    "MobileNetV2",
    "ViTTiny16",
    pytest.param("VGG16", marks=pytest.mark.slow),
    pytest.param("DenseNet121", marks=pytest.mark.slow),
    pytest.param("NASNetMobile", marks=pytest.mark.slow),
]


def test_all_architectures_registered():
    assert {
        "MobileNetV2", "ResNet50", "EfficientNetB0", "VGG16", "VGG19",
        "DenseNet121", "NASNetMobile", "SimpleCNN", "ViTS16", "ViTTiny16",
    } <= set(available_architectures())


@pytest.mark.parametrize("arch", ARCHS)
def test_architecture_forward(arch):
    size = 32
    clf = load_single_model(arch, shape=(size, size))
    assert clf is not None, arch
    batch = np.random.default_rng(0).integers(0, 256, (2, size, size, 3)).astype(np.float32)
    pre = clf[PRE_INP](batch)
    logits = clf[MODEL](pre)
    assert logits.shape == (2, 1000)
    assert np.isfinite(logits).all()


def test_preprocess_ranges():
    from wicca_tpu.models.registry import preprocess_caffe, preprocess_minus1_1, preprocess_torch

    x = np.full((1, 4, 4, 3), 255.0, np.float32)
    assert np.allclose(preprocess_minus1_1(x), 1.0)
    assert np.allclose(preprocess_minus1_1(np.zeros_like(x)), -1.0)
    t = preprocess_torch(x)
    assert t.max() < 3.0 and t.min() > 1.0  # (1 - mean)/std per channel
    c = preprocess_caffe(x)
    assert c[..., 0].max() == pytest.approx(255 - 103.939)  # BGR order


def test_register_architecture_extension():
    import flax.linen as nn
    import jax.numpy as jnp

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1000)(jnp.mean(x, axis=(1, 2)))

    register_architecture("TinyTest", Tiny, lambda v: np.asarray(v, np.float32))
    clf = load_single_model("TinyTest", shape=(16, 16))
    assert clf is not None
    out = clf[MODEL](np.zeros((1, 16, 16, 3), np.float32))
    assert out.shape == (1, 1000)


def test_deterministic_init():
    a = load_single_model("SimpleCNN", shape=(32, 32))
    b = load_single_model("SimpleCNN", shape=(32, 32))
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_array_equal(a[MODEL](x), b[MODEL](x))


def test_nasnet_mobile_param_count():
    """Cell wiring sanity: NASNet-A (4 @ 1056) must land at ~5.3M params
    (Zoph et al. 2018 table 3 reports 5.3M for the mobile config)."""
    import jax
    import jax.numpy as jnp

    from wicca_tpu.models.flax_models import NASNetMobile

    m = NASNetMobile(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 5.0e6 < n < 5.6e6, n


def test_vit_param_counts():
    """ViT-S/16 ~22M and ViT-Tiny/16 ~5.7M params (Dosovitskiy et al. 2021 /
    DeiT Table 1) — wiring sanity for the transformer family."""
    import jax
    import jax.numpy as jnp

    from wicca_tpu.models.flax_models import ViTS16, ViTTiny16

    for factory, target in ((ViTS16, 22.0), (ViTTiny16, 5.7)):
        m = factory()
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        n = sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6
        assert abs(n - target) / target < 0.10, (factory.__name__, n)
