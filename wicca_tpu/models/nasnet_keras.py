"""Checkpoint-faithful NASNet-A Mobile (the hosted-weights graph).

The zoo's :class:`wicca_tpu.models.flax_models.NASNetMobile` follows the
paper's published cells; the HOSTED ImageNet checkpoint, however, is laid
out for keras/applications/nasnet.py's specific functional graph (stem
reduction cells, factorized `adjust` blocks with the shifted second
average-pool path, asymmetric `correct_pad` on every stride-2 separable
conv, TF average-pool semantics that exclude padding from the mean). This
module reimplements THAT graph in Flax, naming every parameterized layer
with the exact Keras layer name, so the Keras->Flax schema
(:func:`wicca_tpu.models.convert._schema_nasnet_mobile`) is a mechanical
walk instead of a hand-maintained table, and
tests/test_keras_parity.py proves activation parity in-process.

NASNet-A (4 @ 1056) mobile config: penultimate_filters=1056 (cell filters
44), num_blocks=4, stem 32, filter_multiplier=2, skip_reduction=False
(Zoph et al. 2018, arXiv:1707.07012; graph per keras.applications).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _correct_pad(h: int, w: int, k: int):
    """Keras imagenet_utils.correct_pad: asymmetric zero padding so a
    stride-2 VALID conv halves odd input sizes the way 'same' would."""
    adjust = (1 - h % 2, 1 - w % 2)
    c = k // 2
    return ((c - adjust[0], c), (c - adjust[1], c))


def _pad2d(x, pad):
    return jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))


def _avg_pool(x, window, strides, padding):
    # TF/Keras AveragePooling2D excludes padded cells from the mean
    return nn.avg_pool(x, window, strides=strides, padding=padding, count_include_pad=False)


class _SepConv(nn.Module):
    """Keras SeparableConv2D: depthwise (Conv_0) + pointwise (Conv_1),
    no bias. Instantiated with the exact Keras layer name; a stride-2
    caller applies correct_pad OUTSIDE (Keras uses a ZeroPadding2D layer)."""

    filters: int
    kernel: int
    strides: tuple
    padding: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = nn.Conv(
            cin, (self.kernel, self.kernel), strides=self.strides,
            padding=self.padding, feature_group_count=cin, use_bias=False,
            dtype=self.dtype, name="Conv_0",
        )(x)
        return nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="Conv_1"
        )(x)


class NASNetMobileKeras(nn.Module):
    """NASNet-A mobile with the hosted checkpoint's layer graph + names."""

    num_classes: int = 1000
    penultimate_filters: int = 1056
    num_blocks: int = 4
    stem_filters: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    def _bn(self, name):
        return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                            dtype=jnp.float32, name=name)

    def _sep_block(self, x, filters, kernel, strides, block_id):
        """relu -> sepconv -> bn -> relu -> sepconv -> bn (keras
        _separable_conv_block)."""
        dt = self.dtype
        x = nn.relu(x)
        if strides == (2, 2):
            x = _pad2d(x, _correct_pad(x.shape[1], x.shape[2], kernel))
            pad = "VALID"
        else:
            pad = "SAME"
        x = _SepConv(filters, kernel, strides, pad, dt,
                     name=f"separable_conv_1_{block_id}")(x)
        x = self._bn(f"separable_conv_1_bn_{block_id}")(x).astype(dt)
        x = nn.relu(x)
        x = _SepConv(filters, kernel, (1, 1), "SAME", dt,
                     name=f"separable_conv_2_{block_id}")(x)
        return self._bn(f"separable_conv_2_bn_{block_id}")(x).astype(dt)

    def _adjust(self, p, ip, filters, block_id):
        """keras _adjust_block: match p's geometry/channels to ip."""
        dt = self.dtype
        if p is None:
            return ip
        if p.shape[1] != ip.shape[1]:  # spatial mismatch -> factorized reduction
            p = nn.relu(p)
            p1 = _avg_pool(p, (1, 1), (2, 2), "VALID")
            p1 = nn.Conv(filters // 2, (1, 1), use_bias=False, dtype=dt,
                         name=f"adjust_conv_1_{block_id}")(p1)
            # second path: shift by one pixel (pad bottom/right, crop top/left)
            p2 = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
            p2 = _avg_pool(p2, (1, 1), (2, 2), "VALID")
            p2 = nn.Conv(filters // 2, (1, 1), use_bias=False, dtype=dt,
                         name=f"adjust_conv_2_{block_id}")(p2)
            p = jnp.concatenate([p1, p2], axis=-1)
            return self._bn(f"adjust_bn_{block_id}")(p).astype(dt)
        if p.shape[-1] != filters:  # channel mismatch -> 1x1 projection
            p = nn.relu(p)
            p = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt,
                        name=f"adjust_conv_projection_{block_id}")(p)
            return self._bn(f"adjust_bn_{block_id}")(p).astype(dt)
        return p

    def _normal_cell(self, ip, p, filters, block_id):
        dt = self.dtype
        p = self._adjust(p, ip, filters, block_id)
        h = nn.relu(ip)
        h = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt,
                    name=f"normal_conv_1_{block_id}")(h)
        h = self._bn(f"normal_bn_1_{block_id}")(h).astype(dt)
        x1 = (self._sep_block(h, filters, 5, (1, 1), f"normal_left1_{block_id}")
              + self._sep_block(p, filters, 3, (1, 1), f"normal_right1_{block_id}"))
        x2 = (self._sep_block(p, filters, 5, (1, 1), f"normal_left2_{block_id}")
              + self._sep_block(p, filters, 3, (1, 1), f"normal_right2_{block_id}"))
        x3 = _avg_pool(h, (3, 3), (1, 1), "SAME") + p
        x4 = (_avg_pool(p, (3, 3), (1, 1), "SAME")
              + _avg_pool(p, (3, 3), (1, 1), "SAME"))
        x5 = self._sep_block(h, filters, 3, (1, 1), f"normal_left5_{block_id}") + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip

    def _reduction_cell(self, ip, p, filters, block_id):
        dt = self.dtype
        p = self._adjust(p, ip, filters, block_id)
        h = nn.relu(ip)
        h = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt,
                    name=f"reduction_conv_1_{block_id}")(h)
        h = self._bn(f"reduction_bn_1_{block_id}")(h).astype(dt)
        h3 = _pad2d(h, _correct_pad(h.shape[1], h.shape[2], 3))
        x1 = (self._sep_block(h, filters, 5, (2, 2), f"reduction_left1_{block_id}")
              + self._sep_block(p, filters, 7, (2, 2), f"reduction_right1_{block_id}"))
        x2 = (nn.max_pool(h3, (3, 3), strides=(2, 2), padding="VALID")
              + self._sep_block(p, filters, 7, (2, 2), f"reduction_right2_{block_id}"))
        x3 = (_avg_pool(h3, (3, 3), (2, 2), "VALID")
              + self._sep_block(p, filters, 5, (2, 2), f"reduction_right3_{block_id}"))
        x4 = _avg_pool(x1, (3, 3), (1, 1), "SAME") + x2
        x5 = (self._sep_block(x1, filters, 3, (1, 1), f"reduction_left4_{block_id}")
              + nn.max_pool(h3, (3, 3), strides=(2, 2), padding="VALID"))
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        filters = self.penultimate_filters // 24  # 44 for mobile
        x = x.astype(dt)
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=dt, name="stem_conv1")(x)
        x = self._bn("stem_bn1")(x).astype(dt)
        p = None
        x, p = self._reduction_cell(x, p, filters // 4, "stem_1")
        x, p = self._reduction_cell(x, p, filters // 2, "stem_2")
        for i in range(self.num_blocks):
            x, p = self._normal_cell(x, p, filters, f"{i}")
        x, p = self._reduction_cell(x, p, filters * 2, f"reduce_{self.num_blocks}")
        for i in range(self.num_blocks):
            x, p = self._normal_cell(x, p, filters * 2, f"{self.num_blocks + i + 1}")
        x, p = self._reduction_cell(x, p, filters * 4, f"reduce_{2 * self.num_blocks}")
        for i in range(self.num_blocks):
            x, p = self._normal_cell(x, p, filters * 4, f"{2 * self.num_blocks + i + 1}")
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="predictions")(x)
