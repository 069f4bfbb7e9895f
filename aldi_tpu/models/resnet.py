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
    def __call__(self, x=None):
        """Apply frozen batch-norm to ``x``; with ``x=None`` return the
        f32 ``(scale, shift)`` pair instead, for callers that fold the
        affine into the preceding conv's weights (see ``Bottleneck``)."""
        shape = (self.features,)
        weight = self.variable("frozen", "weight", jnp.ones, shape).value
        bias = self.variable("frozen", "bias", jnp.zeros, shape).value
        mean = self.variable("frozen", "running_mean", jnp.zeros, shape).value
        var = self.variable("frozen", "running_var", jnp.ones, shape).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        if x is None:
            return scale, shift
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class _ConvKernel(nn.Module):
    """Bare conv kernel parameter under the same name tree as ``nn.Conv``
    (``{name}/kernel``), so the folded-BN path below stays checkpoint- and
    converter-compatible with the unfolded one."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            tuple(self.shape),
        )


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dilation: int = 1
    # fold_bn=True folds the FrozenBN affine into the conv kernel:
    # conv(x, W)*s + b == conv(x, W*s) + b exactly (s, b are per-output-
    # channel constants), so the scale is applied to ~25M weight elements
    # once per step instead of to every post-conv activation tensor
    # (hundreds of MB per image at 1024x2048) — the HBM-bandwidth fusion
    # slack called out in README's roofline paragraph. Parameter and
    # frozen-collection name trees are identical either way.
    fold_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        def conv_bn(x, f, k, s, name, d=1):
            pad = [(d * (k // 2), d * (k // 2))] * 2
            if not self.fold_bn:
                out = nn.Conv(
                    f, (k, k), (s, s), padding=pad, kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype, name=name,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"),
                )(x)
                return FrozenBN(f, name=f"{name}_norm")(out)
            kern = _ConvKernel((k, k, x.shape[-1], f), name=name)()
            scale, shift = FrozenBN(f, name=f"{name}_norm")()
            kern = (kern.astype(jnp.float32) * scale).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern, (s, s), pad,
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + shift.astype(out.dtype)

        out = conv_bn(x, self.bottleneck_channels, 1, s1, "conv1")
        out = nn.relu(out)
        out = conv_bn(out, self.bottleneck_channels, 3, s3, "conv2",
                      d=self.dilation)
        out = nn.relu(out)
        out = conv_bn(out, self.out_channels, 1, 1, "conv3")
        if self.has_shortcut:
            sc = conv_bn(x, self.out_channels, 1, self.stride, "shortcut")
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
    fold_bn: bool = True  # see Bottleneck.fold_bn
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # depth 26 = one bottleneck per stage: a tiny variant for fast tests
        blocks_per_stage = {26: [1, 1, 1, 1], 50: [3, 4, 6, 3],
                            101: [3, 4, 23, 3]}[self.depth]

        # stem: 7x7/2 conv + maxpool/2
        if self.fold_bn:
            kern = _ConvKernel((7, 7, x.shape[-1], 64), name="stem_conv1")()
            scale, shift = FrozenBN(64, name="stem_conv1_norm")()
            kern = (kern.astype(jnp.float32) * scale).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = out + shift.astype(out.dtype)
        else:
            out = nn.Conv(
                64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                dtype=self.dtype, name="stem_conv1",
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"),
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
                    fold_bn=self.fold_bn,
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
