"""ResNet backbone (D2-compatible variant) in Flax, NHWC.

Replaces the substrate's ``build_resnet_backbone`` consumed via
``configs/detectron2/Base-RCNN-FPN.yaml:4`` (R50, FrozenBN, caffe-style
stride-in-1x1). Parameter naming mirrors the substrate's module tree
(stem/res2..res5, convN, shortcut) so zoo checkpoint import is a mechanical
name map (see engine/checkpoint.py converter).

FrozenBN keeps (weight, bias, running_mean, running_var) in the ``frozen``
variable collection: never differentiated, never touched by the optimizer,
carried through EMA by copy — exactly the substrate's buffer semantics.

Stage freezing (MODEL.BACKBONE.FREEZE_AT, reference default 2) is a
``stop_gradient`` on the frozen prefix's output plus an optimizer mask
(solver.py); the stop_gradient also lets XLA skip the frozen backward.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.variable("frozen", "weight", jnp.ones, shape).value
        bias = self.variable("frozen", "bias", jnp.zeros, shape).value
        mean = self.variable("frozen", "running_mean", jnp.zeros, shape).value
        var = self.variable("frozen", "running_var", jnp.ones, shape).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale.astype(x.dtype) + (bias - mean * scale).astype(x.dtype)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        conv = lambda f, k, s, name, d=1: nn.Conv(
            f, (k, k), (s, s), padding=[(d * (k // 2), d * (k // 2))] * 2,
            kernel_dilation=(d, d), use_bias=False,
            dtype=self.dtype, name=name,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        out = conv(self.bottleneck_channels, 1, s1, "conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)
        out = conv(self.bottleneck_channels, 3, s3, "conv2",
                   d=self.dilation)(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)
        out = conv(self.out_channels, 1, 1, "conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)
        if self.has_shortcut:
            sc = conv(self.out_channels, 1, self.stride, "shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns a dict of stage outputs {"res2": ..., ..., "res5": ...}."""

    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    freeze_at: int = 2
    stride_in_1x1: bool = True
    # res5_dilation=2 (DC5): res5 keeps stride-16 resolution with dilated
    # 3x3 convs. Semantics follow the checkpoint ecosystem selected by
    # stride_in_1x1: caffe/D2 (True) dilates every res5 block; torchvision
    # replace_stride_with_dilation (False) keeps the FIRST block at
    # dilation 1 (its stride is replaced, previous_dilation was 1) and
    # dilates the rest — the two layouts compute different functions.
    res5_dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # depth 26 = one bottleneck per stage: a tiny variant for fast tests
        blocks_per_stage = {26: [1, 1, 1, 1], 50: [3, 4, 6, 3],
                            101: [3, 4, 23, 3]}[self.depth]

        # stem: 7x7/2 conv + maxpool/2
        out = nn.Conv(
            64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="stem_conv1",
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )(x)
        out = FrozenBN(64, name="stem_conv1_norm")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        if self.freeze_at >= 1:
            out = jax.lax.stop_gradient(out)

        feats = {}
        in_ch, bott_ch, out_ch = 64, 64, 256
        for stage_idx, n_blocks in enumerate(blocks_per_stage):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            dilated = name == "res5" and self.res5_dilation > 1
            if dilated:
                stride = 1
            for b in range(n_blocks):
                d = 1
                if dilated and (self.stride_in_1x1 or b > 0):
                    d = self.res5_dilation
                out = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=(b == 0),
                    dilation=d,
                    dtype=self.dtype,
                    name=f"{name}_block{b}",
                )(out)
            if self.freeze_at >= stage_idx + 2:
                out = jax.lax.stop_gradient(out)
            if name in self.out_features:
                feats[name] = out
            bott_ch *= 2
            out_ch *= 2
        return feats
