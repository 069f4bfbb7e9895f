"""Feature Pyramid Network (lateral + top-down + extra max-pool level).

Replaces the substrate's ``FPN``/``LastLevelMaxPool`` consumed at reference
``aldi/backbone.py:15,384-391`` and by ``build_resnet_fpn_backbone``
(``configs/detectron2/Base-RCNN-FPN.yaml:4``): 1x1 lateral convs, nearest
top-down upsampling with sum fusion, 3x3 output convs, and a stride-2
max-pool p6.
"""

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp


class FPN(nn.Module):
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    top_block_maxpool: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        # c2 xavier (fan-in uniform) init, substrate convention for FPN convs
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        feats = [bottom_up[f] for f in self.in_features]  # finest -> coarsest
        n = len(feats)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=init, name=f"lateral{i + 2}")(feats[i])
            for i in range(n)
        ]
        # top-down pathway: coarsest first
        merged = [None] * n
        merged[n - 1] = laterals[n - 1]
        for i in range(n - 2, -1, -1):
            up = _upsample_nearest_2x(merged[i + 1])
            merged[i] = laterals[i] + up

        outs = {}
        for i in range(n):
            outs[f"p{i + 2}"] = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, kernel_init=init, name=f"output{i + 2}"
            )(merged[i])
        if self.top_block_maxpool:
            top = outs[f"p{n + 1}"]
            outs[f"p{n + 2}"] = nn.max_pool(top, (1, 1), (2, 2))
        return outs


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
