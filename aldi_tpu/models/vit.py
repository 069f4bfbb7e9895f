"""ViTDet backbone: plain ViT + SimpleFeaturePyramid, windowed attention.

Substrate equivalent: ``detectron2.modeling.backbone.vit`` as instantiated by
the reference's ``build_vitdet_b/l_backbone`` (``aldi/backbone.py:37-64``):
patch embed 16x16, decomposed relative position embeddings, window attention
(window 14) with global attention at blocks [2,5,8,11] (B) / [5,11,17,23]
(L), drop-path 0.1/0.4, SimpleFeaturePyramid with scale factors
(4, 2, 1, 0.5) + max-pool p6, square padding disabled.

Activation checkpointing (VIT.USE_ACT_CHECKPOINT, reference
``aldi/backbone.py:19-35``) maps to ``flax.linen.remat`` over blocks —
XLA-native rematerialization instead of torch's non-reentrant checkpoint
hack.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dispatch import target_backend


def get_abs_pos(pos_embed: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Interpolate [1, P, P, D] pretrain pos embeddings to (H, W)."""
    h, w = hw
    if pos_embed.shape[1] == h and pos_embed.shape[2] == w:
        return pos_embed
    return jax.image.resize(
        pos_embed, (1, h, w, pos_embed.shape[-1]), method="bicubic"
    )


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """[2*max(q,k)-1, C] table -> [q, k, C] lookups (substrate
    ``get_rel_pos``; q_size == k_size in this stack, so no interpolation)."""
    max_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_dist, rel_pos.shape[-1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        # head-major DenseGeneral layout (kernel [C, 3, nh, hd]) so the
        # head axis is a real tensor dim the TP mesh can shard
        # (parallel/mesh.py; a flat [C, 3*nh*hd] Dense hides heads inside
        # a composite dim GSPMD cannot split at head granularity)
        qkv = nn.DenseGeneral(
            features=(3, self.num_heads, head_dim), dtype=self.dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # [B, HW, nh, hd]
        q = jnp.moveaxis(q, 2, 1)  # [B, nh, HW, hd]
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)

        scale = head_dim ** -0.5
        attn = jnp.einsum(
            "bnqd,bnkd->bnqk", q * scale, k,
            preferred_element_type=jnp.float32,
        )

        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * h - 1, head_dim)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * w - 1, head_dim)
            )
            Rh = get_rel_pos(h, h, rel_h.astype(jnp.float32))  # [h, h, d]
            Rw = get_rel_pos(w, w, rel_w.astype(jnp.float32))
            rq = q.reshape(b, self.num_heads, h, w, head_dim).astype(
                jnp.float32
            )
            bias_h = jnp.einsum("bnhwd,hkd->bnhwk", rq, Rh)
            bias_w = jnp.einsum("bnhwd,wkd->bnhwk", rq, Rw)

            from ..ops.pallas_flash_attn import (
                flash_attention_relpos, supported_shape,
            )

            if (target_backend() == "tpu" and h * w >= 1024
                    and supported_shape(h * w, w)):
                # global blocks: Pallas kernel keeps the [N, N] rows in
                # VMEM (the XLA path materializes 5+ [B, nh, N, N] f32
                # tensors per block); decomposed bias stays decomposed.
                # supported_shape gates out canvases whose token count
                # has no exact tiling (e.g. 50x84) — those take the XLA
                # formulation below instead of silently dropping tokens.

                g = b * self.num_heads
                n = h * w
                out = flash_attention_relpos(
                    q.reshape(g, n, head_dim),
                    k.reshape(g, n, head_dim),
                    v.reshape(g, n, head_dim),
                    bias_h.reshape(g, n, h),
                    bias_w.reshape(g, n, w),
                    scale,  # kernel scales logits, not the bias
                    h, w,
                )
                out = out.reshape(b, self.num_heads, n, head_dim)
                out = jnp.moveaxis(out, 1, 2).reshape(
                    b, h, w, self.num_heads, head_dim)
                return nn.DenseGeneral(
                    features=self.dim, axis=(-2, -1), dtype=self.dtype,
                    name="proj",
                )(out)

            attn = attn.reshape(b, self.num_heads, h, w, h, w)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(b, self.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(
            b, h, w, self.num_heads, head_dim)
        # row-parallel contraction over (nh, hd): under TP the partial
        # products reduce with ONE all-reduce here
        return nn.DenseGeneral(
            features=self.dim, axis=(-2, -1), dtype=self.dtype, name="proj",
        )(out)


def window_partition(x, window: int):
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp * wp // window // window)
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        hw = (y.shape[1], y.shape[2])
        if self.window_size > 0:
            y, pad_hw = window_partition(y, self.window_size)
        size = (
            (self.window_size, self.window_size)
            if self.window_size > 0 else hw
        )
        y = Attention(
            self.dim, self.num_heads, self.use_rel_pos, size,
            dtype=self.dtype, name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, hw)
        x = shortcut + self._drop_path(y, train)

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y, train)

    def _drop_path(self, y, train):
        if self.drop_path == 0.0 or not train:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        return y * mask.astype(y.dtype) / keep


class ViT(nn.Module):
    """Plain ViT trunk; returns the final stride-16 feature map NHWC."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    window_size: int = 14
    global_blocks: Sequence[int] = (2, 5, 8, 11)
    drop_path_rate: float = 0.1
    pretrain_img_size: int = 224
    use_act_checkpoint: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            (self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        p = self.pretrain_img_size // self.patch_size
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, p, p, self.embed_dim),
        )
        x = x + get_abs_pos(
            pos.astype(jnp.float32), (x.shape[1], x.shape[2])
        ).astype(x.dtype)

        dp = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        block_cls = Block
        if self.use_act_checkpoint:
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                window_size=0 if i in self.global_blocks else self.window_size,
                drop_path=dp[i],
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x


class SimpleFeaturePyramid(nn.Module):
    """stride-16 trunk output -> {p2..p6} (substrate SimpleFeaturePyramid:
    per-scale [deconv]* -> 1x1 conv+LN -> 3x3 conv+LN, max-pool p6)."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H/16, W/16, D]
        outs = {}
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)
        for i, scale in enumerate((4.0, 2.0, 1.0, 0.5)):
            y = x
            dim = x.shape[-1]
            if scale == 4.0:
                y = nn.ConvTranspose(dim // 2, (2, 2), (2, 2),
                                     dtype=self.dtype,
                                     name=f"simfp_{i}_deconv1")(y)
                y = ln(f"simfp_{i}_ln")(y).astype(self.dtype)
                y = nn.gelu(y, approximate=False)
                y = nn.ConvTranspose(dim // 4, (2, 2), (2, 2),
                                     dtype=self.dtype,
                                     name=f"simfp_{i}_deconv2")(y)
            elif scale == 2.0:
                y = nn.ConvTranspose(dim // 2, (2, 2), (2, 2),
                                     dtype=self.dtype,
                                     name=f"simfp_{i}_deconv1")(y)
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), (2, 2))
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"simfp_{i}_conv1")(y)
            y = ln(f"simfp_{i}_norm1")(y).astype(self.dtype)
            y = nn.Conv(self.out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"simfp_{i}_conv2")(y)
            y = ln(f"simfp_{i}_norm2")(y).astype(self.dtype)
            outs[f"p{i + 2}"] = y
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), (2, 2))
        return outs


VIT_CONFIGS = {
    "b": dict(embed_dim=768, depth=12, num_heads=12, drop_path_rate=0.1,
              global_blocks=(2, 5, 8, 11)),
    "l": dict(embed_dim=1024, depth=24, num_heads=16, drop_path_rate=0.4,
              global_blocks=(5, 11, 17, 23)),
}
