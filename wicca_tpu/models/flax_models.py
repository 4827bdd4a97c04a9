"""Flax (linen) CNN classifier zoo — TPU-native replacement for the
reference's ``tensorflow.keras.applications`` models (SURVEY.md C11).

Architectures are implemented from their papers (MobileNetV2:
Sandler et al. 2018; ResNet: He et al. 2015; EfficientNet-B0: Tan & Le 2019),
NHWC layout (TPU conv native), optional bfloat16 compute with float32 params
— convolutions land on the MXU.

Weights: pretrained checkpoints load from ``WICCA_TPU_WEIGHTS/<name>.msgpack``
(flax serialization) when present; otherwise deterministic per-name random
init. The comparison harness measures *relative* agreement between a source
image and its icon through the same network, so it stays meaningful either
way (and is exercised in tests with a tiny deterministic CNN).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Callable


class SimpleCNN(nn.Module):
    """Small deterministic CNN for tests and smoke runs."""

    num_classes: int = 1000
    features: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i in range(3):
            x = nn.Conv(self.features * 2**i, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # keras.applications compatibility knobs (tools/convert_weights.py): the
    # Keras BatchNormalization default eps is 1e-3 (MobileNetV2/EfficientNet);
    # ResNet/DenseNet set 1.001e-5 explicitly. relu6 is the MobileNet family
    # activation; ResNet uses plain relu.
    bias: bool = False
    eps: float = 1e-3
    act_fn: Callable = nn.relu6

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            feature_group_count=self.groups,
            use_bias=self.bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=self.eps, dtype=jnp.float32)(x)
        return self.act_fn(x) if self.act else x


class _InvertedResidual(nn.Module):
    features: int
    strides: tuple[int, int]
    expand: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _ConvBN(inp * self.expand, (1, 1), dtype=self.dtype)(h)
        h = _ConvBN(
            inp * self.expand, (3, 3), self.strides, groups=inp * self.expand, dtype=self.dtype
        )(h)
        h = _ConvBN(self.features, (1, 1), act=False, dtype=self.dtype)(h)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """MobileNetV2 (width 1.0), 224x224 -> 1000 logits."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    # (expansion t, channels c, repeats n, stride s) per paper Table 2
    config: Sequence[tuple[int, int, int, int]] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = _ConvBN(32, (3, 3), (2, 2), dtype=self.dtype)(x)
        for t, c, n, s in self.config:
            for i in range(n):
                x = _InvertedResidual(c, (s, s) if i == 0 else (1, 1), t, dtype=self.dtype)(x)
        x = _ConvBN(1280, (1, 1), dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


_RESNET_EPS = 1.001e-5  # keras.applications ResNet/DenseNet BN epsilon


class _Bottleneck(nn.Module):
    """ResNet v1 bottleneck, keras.applications structure: the stride sits on
    the FIRST 1x1 conv (keras resnet.py block1), convs carry biases, plain
    relu, BN eps 1.001e-5 — so converted 'imagenet' weights reproduce Keras
    activations."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(bias=True, eps=_RESNET_EPS, act_fn=nn.relu, dtype=self.dtype)
        residual = x
        h = _ConvBN(self.features, (1, 1), self.strides, **kw)(x)
        h = _ConvBN(self.features, (3, 3), **kw)(h)
        h = _ConvBN(self.features * 4, (1, 1), act=False, **kw)(h)
        if residual.shape != h.shape:
            residual = _ConvBN(self.features * 4, (1, 1), self.strides, act=False, **kw)(x)
        return nn.relu(h + residual)


class ResNet50(nn.Module):
    """ResNet-50 v1, 224x224 -> 1000 logits (keras.applications-compatible
    geometry: explicit (3,3) stem pad + (1,1) pool pad, not XLA SAME)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    stages: Sequence[tuple[int, int]] = ((64, 3), (128, 4), (256, 6), (512, 3))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (feat, blocks) in enumerate(self.stages):
            for i in range(blocks):
                strides = (2, 2) if stage > 0 and i == 0 else (1, 1)
                x = _Bottleneck(feat, strides, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class _SqueezeExcite(nn.Module):
    features: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        hidden = max(1, int(self.features * self.se_ratio))
        s = nn.Conv(hidden, (1, 1), dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class _MBConv(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int]
    expand: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _ConvBN(inp * self.expand, (1, 1), act_fn=nn.silu, dtype=self.dtype)(h)
        h = nn.Conv(
            inp * self.expand,
            self.kernel,
            strides=self.strides,
            feature_group_count=inp * self.expand,
            use_bias=False,
            dtype=self.dtype,
        )(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = _SqueezeExcite(inp, dtype=self.dtype)(h)
        h = _ConvBN(self.features, (1, 1), act=False, dtype=self.dtype)(h)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


class EfficientNetB0(nn.Module):
    """EfficientNet-B0, 224x224 -> 1000 logits (silu activations + SE)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    # (expand, channels, repeats, stride, kernel) per paper Table 1
    config: Sequence[tuple[int, int, int, int, int]] = (
        (1, 16, 1, 1, 3),
        (6, 24, 2, 2, 3),
        (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3),
        (6, 112, 3, 1, 5),
        (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=jnp.float32)(x)
        x = nn.silu(x)
        for t, c, n, s, k in self.config:
            for i in range(n):
                x = _MBConv(c, (k, k), (s, s) if i == 0 else (1, 1), t, dtype=self.dtype)(x)
        x = _ConvBN(1280, (1, 1), act_fn=nn.silu, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


def _sep_block(x, filters, kernel, strides, dtype):
    """NASNet separable-conv block: relu -> sepconv(k, s) -> bn -> relu ->
    sepconv(k, 1) -> bn. Depthwise+pointwise pairs land on the MXU."""
    h = nn.relu(x)
    for i, s in enumerate((strides, (1, 1))):
        ch = h.shape[-1]
        h = nn.Conv(ch, kernel, strides=s, feature_group_count=ch, use_bias=False, dtype=dtype)(h)
        h = nn.Conv(filters, (1, 1), use_bias=False, dtype=dtype)(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(h).astype(dtype)
        if i == 0:
            h = nn.relu(h)
    return h


def _adjust(p, ip, filters, dtype):
    """Match the previous hidden state ``p`` to ``ip``'s spatial dims and the
    cell's filter count (factorized reduction with the 1-pixel-shift second
    path, as in the NASNet paper's reference implementation)."""
    if p is None:
        p = ip
    if p.shape[1] != ip.shape[1]:
        p = nn.relu(p)
        p1 = nn.avg_pool(p, (1, 1), strides=(2, 2))
        p1 = nn.Conv(filters // 2, (1, 1), use_bias=False, dtype=dtype)(p1)
        p2 = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = nn.avg_pool(p2, (1, 1), strides=(2, 2))
        p2 = nn.Conv(filters - filters // 2, (1, 1), use_bias=False, dtype=dtype)(p2)
        p = jnp.concatenate([p1, p2], axis=-1)
        p = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(p).astype(dtype)
    elif p.shape[-1] != filters:
        p = nn.relu(p)
        p = nn.Conv(filters, (1, 1), use_bias=False, dtype=dtype)(p)
        p = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(p).astype(dtype)
    return p


def _avg3(x, strides=(1, 1)):
    return nn.avg_pool(x, (3, 3), strides=strides, padding="SAME")


def _max3(x, strides=(1, 1)):
    return nn.max_pool(x, (3, 3), strides=strides, padding="SAME")


class _NormalCellA(nn.Module):
    """NASNet-A normal cell (Zoph et al. 2018, fig. 4 left)."""

    filters: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, p):
        f, dt = self.filters, self.dtype
        ip = x
        p = _adjust(p, x, f, dt)
        h = nn.relu(x)
        h = nn.Conv(f, (1, 1), use_bias=False, dtype=dt)(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(h).astype(dt)
        x1 = _sep_block(h, f, (5, 5), (1, 1), dt) + _sep_block(p, f, (3, 3), (1, 1), dt)
        x2 = _sep_block(p, f, (5, 5), (1, 1), dt) + _sep_block(p, f, (3, 3), (1, 1), dt)
        x3 = _avg3(h) + p
        x4 = _avg3(p) * jnp.asarray(2, dt)  # two identical avg-pool branches
        x5 = _sep_block(h, f, (3, 3), (1, 1), dt) + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip


class _ReductionCellA(nn.Module):
    """NASNet-A reduction cell (Zoph et al. 2018, fig. 4 right)."""

    filters: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, p):
        f, dt = self.filters, self.dtype
        ip = x
        p = _adjust(p, x, f, dt)
        h = nn.relu(x)
        h = nn.Conv(f, (1, 1), use_bias=False, dtype=dt)(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(h).astype(dt)
        s2 = (2, 2)
        x1 = _sep_block(h, f, (5, 5), s2, dt) + _sep_block(p, f, (7, 7), s2, dt)
        x2 = _max3(h, s2) + _sep_block(p, f, (7, 7), s2, dt)
        x3 = _avg3(h, s2) + _sep_block(p, f, (5, 5), s2, dt)
        x4 = _avg3(x1) + x2
        x5 = _sep_block(x1, f, (3, 3), (1, 1), dt) + _max3(h, s2)
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip


class NASNetMobile(nn.Module):
    """NASNet-A (4 @ 1056) mobile config, 224x224 -> 1000 logits
    (Zoph et al. 2018; BASELINE.json config 4 names MobileNetV2/NASNet).

    Cell wiring follows the paper's published NASNet-A cells; not intended
    to be weight-compatible with any specific checkpoint format.
    """

    num_classes: int = 1000
    penultimate_filters: int = 1056
    cells_per_stack: int = 4
    stem_filters: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.penultimate_filters // 24  # 44 for mobile
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x).astype(dt)
        p = None
        x, p = _ReductionCellA(max(1, f // 4), dtype=dt)(x, p)
        x, p = _ReductionCellA(max(1, f // 2), dtype=dt)(x, p)
        for mult in (1, 2, 4):
            if mult > 1:
                x, p = _ReductionCellA(f * mult, dtype=dt)(x, p)
            for _ in range(self.cells_per_stack):
                x, p = _NormalCellA(f * mult, dtype=dt)(x, p)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class VGG(nn.Module):
    """VGG-16/19 (Simonyan & Zisserman 2014), 224x224 -> 1000 logits."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    # channels per conv block; repeats distinguish 16 vs 19
    blocks: Sequence[tuple[int, int]] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for feat, reps in self.blocks:
            for _ in range(reps):
                x = nn.Conv(feat, (3, 3), dtype=self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.relu(nn.Dense(4096)(x))
        return nn.Dense(self.num_classes)(x)


def VGG16():
    return VGG()


def VGG19():
    return VGG(blocks=((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)))


class _DenseBlockLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), use_bias=False, dtype=self.dtype)(h)
        return jnp.concatenate([x, h.astype(x.dtype)], axis=-1)


class DenseNet121(nn.Module):
    """DenseNet-121 (Huang et al. 2017), 224x224 -> 1000 logits
    (keras.applications-compatible geometry: explicit (3,3) stem pad +
    (1,1) pool pad, BN eps 1.001e-5)."""

    num_classes: int = 1000
    growth: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    stage_layers: Sequence[int] = (6, 12, 24, 16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, layers in enumerate(self.stage_layers):
            for _ in range(layers):
                x = _DenseBlockLayer(self.growth, dtype=self.dtype)(x)
            if si != len(self.stage_layers) - 1:
                x = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False, dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=True, epsilon=_RESNET_EPS, dtype=jnp.float32)(x)
        x = jnp.mean(nn.relu(x), axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes)(x)


class _TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block (ViT, Dosovitskiy et al. 2021 §3.1)."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype
        )(y, y)
        x = x + y.astype(jnp.float32)
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y.astype(jnp.float32)


class ViT(nn.Module):
    """Vision Transformer (Dosovitskiy et al. 2021) — the zoo's transformer
    family next to the CNNs (the reference's Keras zoo is CNN-only; ViTs are
    the other dominant ImageNet classifier family). Patch embedding is a
    strided conv; class token + learned position embeddings; pre-LN encoder.
    All heavy ops are (batch*tokens, dim) matmuls — MXU-native, bfloat16
    compute with float32 residual stream and params."""

    num_classes: int = 1000
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, self.dim).astype(jnp.float32)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos
        for _ in range(self.depth):
            x = _TransformerBlock(self.dim, self.heads, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x[:, 0])


def ViTS16():
    """ViT-Small/16 (22M params)."""
    return ViT(dim=384, depth=12, heads=6)


def ViTTiny16():
    """ViT-Tiny/16 (5.7M params) — the quick transformer for smoke runs."""
    return ViT(dim=192, depth=12, heads=3)


# checkpoint-faithful NASNet (hosted-weights graph; see models/nasnet_keras.py)
from wicca_tpu.models.nasnet_keras import NASNetMobileKeras  # noqa: E402
