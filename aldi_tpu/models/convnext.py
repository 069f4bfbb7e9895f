"""ConvNeXt backbone in Flax.

Substrate equivalent: the reference's vendored ConvNeXt implementation
(``aldi/backbone.py:155-355``: DropPath, block with 7x7 depthwise conv +
pointwise MLP + layer scale, stage norms, dual-format LayerNorm) registered
as ``build_convnext_backbone``/``build_convnext_fpn_backbone``
(``aldi/backbone.py:357-391``). Defaults are ConvNeXt-T; the shipped configs
use ConvNeXt-L (reference ``configs/Base-RCNN-ConvNeXt-FPN.yaml``).

NHWC throughout: channels-last is both the TPU-native layout and ConvNeXt's
own preferred layout, so the reference's dual-format LayerNorm collapses to
plain LayerNorm.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y).astype(self.dtype)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            y = y * gamma.astype(y.dtype)
        if self.drop_path > 0.0 and train:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
            )
            y = y * mask.astype(y.dtype) / keep
        return shortcut + y


class ConvNeXt(nn.Module):
    """Returns {"res2".."res5"} stage outputs (strides 4/8/16/32) with
    per-stage output LayerNorms, ready for the shared FPN."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.2
    layer_scale_init: float = 1e-6
    out_features: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.depths)
        dp = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        feats = {}
        cur = 0
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(self.dims[0], (4, 4), (4, 4), padding="VALID",
                            dtype=self.dtype, name="downsample0_conv")(x)
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name="downsample0_norm")(x).astype(self.dtype)
            else:
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"downsample{stage}_norm")(x).astype(
                                     self.dtype)
                x = nn.Conv(self.dims[stage], (2, 2), (2, 2), padding="VALID",
                            dtype=self.dtype,
                            name=f"downsample{stage}_conv")(x)
            for b in range(self.depths[stage]):
                x = ConvNeXtBlock(
                    dim=self.dims[stage], drop_path=dp[cur + b],
                    layer_scale_init=self.layer_scale_init,
                    dtype=self.dtype, name=f"stage{stage}_block{b}",
                )(x, train)
            cur += self.depths[stage]
            if stage in self.out_features:
                out = nn.LayerNorm(
                    dtype=jnp.float32, name=f"out_norm{stage}"
                )(x).astype(self.dtype)
                feats[f"res{stage + 2}"] = out
        return feats
