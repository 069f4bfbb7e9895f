"""Optimizers and LR schedules (optax).

Replaces the substrate solver consumed at reference ``aldi/trainer.py:10,198-208``
(D2 ``build_optimizer``: SGD momentum + warmup multistep; AdamW for ViTDet via
``get_adamw_optim``, reference ``aldi/backbone.py:66-84``). Stage freezing
(MODEL.BACKBONE.FREEZE_AT) is enforced here with an update mask in addition to
the model's stop_gradient, so weight decay cannot drift frozen parameters.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def scale_updates_by_tree(mults) -> "optax.GradientTransformation":
    """Multiply each update leaf by a constant from a matching tree (used
    for per-layer LR factors)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        # inside optax.masked, frozen leaves are MaskedNode placeholders
        def is_masked(x):
            return type(x).__name__ == "MaskedNode"

        def mul(u, m):
            return u if is_masked(u) else u * m

        return (
            jax.tree_util.tree_map(mul, updates, mults, is_leaf=is_masked),
            state,
        )

    return optax.GradientTransformation(init, update)


def _vit_lr_decay_multipliers(params, num_layers: int, rate: float):
    """Substrate ``get_vit_lr_decay_rate`` (consumed at reference
    ``aldi/backbone.py:75-77``): multiplier = rate^(num_layers+1-layer_id);
    patch/pos embed are layer 0, block i is layer i+1, non-backbone 1.0."""

    def mult_for(path):
        keys = [getattr(k, "key", "") for k in path]
        if not keys or keys[0] != "backbone":
            return 1.0
        layer_id = 0
        for k in keys[1:]:
            if k.startswith("block"):
                layer_id = int(k[len("block"):]) + 1
                break
        return rate ** (num_layers + 1 - layer_id)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: mult_for(path), params
    )


def warmup_multistep_schedule(cfg) -> Callable:
    """D2 WarmupMultiStepLR: linear warmup from WARMUP_FACTOR, then BASE_LR *
    GAMMA^(#milestones passed)."""
    base = cfg.SOLVER.BASE_LR
    gamma = cfg.SOLVER.GAMMA
    steps = sorted(cfg.SOLVER.STEPS)
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor * (1 - count / max(warmup_iters, 1))
            + count / max(warmup_iters, 1),
            1.0,
        )
        decay = jnp.asarray(1.0, jnp.float32)
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base * warm * decay

    return schedule


def warmup_cosine_schedule(cfg) -> Callable:
    base = cfg.SOLVER.BASE_LR
    max_iter = cfg.SOLVER.MAX_ITER
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    end = cfg.SOLVER.BASE_LR_END

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor * (1 - count / max(warmup_iters, 1))
            + count / max(warmup_iters, 1),
            1.0,
        )
        t = jnp.clip(count / max_iter, 0.0, 1.0)
        cos = end + (1.0 - end) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return base * warm * cos

    return schedule


def build_lr_schedule(cfg) -> Callable:
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name in ("WarmupMultiStepLR", "WarmupMultiStepParamScheduler"):
        return warmup_multistep_schedule(cfg)
    if name == "WarmupCosineLR":
        return warmup_cosine_schedule(cfg)
    raise ValueError(f"Unknown LR scheduler {name}")


def _freeze_mask(params, freeze_at: int):
    """True = trainable. Frozen: stem (freeze_at>=1) and res2..res{freeze_at}
    under the 'backbone' subtree."""
    frozen_prefixes = []
    if freeze_at >= 1:
        frozen_prefixes.append("stem")
    for stage in range(2, freeze_at + 1):
        frozen_prefixes.append(f"res{stage}_")

    def mask_tree(tree, path=()):
        if isinstance(tree, dict):
            return {k: mask_tree(v, path + (k,)) for k, v in tree.items()}
        if len(path) >= 2 and path[0] == "backbone":
            name = path[1]
            if any(name.startswith(p) for p in frozen_prefixes):
                return False
        return True

    return mask_tree(params)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """cfg + param tree -> optax transformation, mirroring the reference's
    optimizer selection (SGD default; ADAMW via SOLVER.OPTIMIZER)."""
    schedule = build_lr_schedule(cfg)
    opt_name = (cfg.SOLVER.OPTIMIZER or "SGD").upper()

    if opt_name == "SGD":
        chain = [
            optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY),
            optax.sgd(
                learning_rate=schedule,
                momentum=cfg.SOLVER.MOMENTUM,
                nesterov=cfg.SOLVER.NESTEROV,
            ),
        ]
    elif opt_name == "ADAMW":
        # reference get_adamw_optim: pos_embed gets no weight decay
        # (``aldi/backbone.py:83``)
        def decay_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not any(
                    getattr(k, "key", "") == "pos_embed" for k in path
                ),
                params,
            )

        chain = [
            optax.adamw(
                learning_rate=schedule,
                b1=0.9, b2=0.999,
                weight_decay=cfg.SOLVER.WEIGHT_DECAY,
                mask=decay_mask,
            )
        ]
        # layer-wise LR decay for ViT-B only, matching the reference
        # (``aldi/trainer.py:206``: include_vit_lr_decay only when the
        # backbone is build_vitdet_b_backbone, rate 0.7 over 12 layers)
        if cfg.MODEL.BACKBONE.NAME == "build_vitdet_b_backbone":
            chain.append(
                scale_updates_by_tree(
                    _vit_lr_decay_multipliers(params, 12, 0.7)
                )
            )
        # DETR per-group LR multipliers (reference
        # configs/Base-DETR.yaml:62-70): backbone x0.1,
        # sampling_offsets/reference_points x0.1
        if cfg.MODEL.META_ARCHITECTURE == "DeformableDETR":
            bb_mult = cfg.SOLVER.BACKBONE_LR_MULTIPLIER
            proj_mult = cfg.SOLVER.LR_LINEAR_PROJ_MULTIPLIER
            proj_names = tuple(cfg.SOLVER.LR_LINEAR_PROJ_NAMES)

            def detr_mult(path, _):
                keys = [getattr(k, "key", "") for k in path]
                if keys and keys[0] == "backbone":
                    return bb_mult
                if any(k in proj_names for k in keys):
                    return proj_mult
                return 1.0

            chain.append(
                scale_updates_by_tree(
                    jax.tree_util.tree_map_with_path(detr_mult, params)
                )
            )
    else:
        raise ValueError(f"Unsupported optimizer {opt_name}")

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        ctype = cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE
        cval = cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE
        clip = (
            optax.clip(cval) if ctype == "value" else optax.clip_by_global_norm(cval)
        )
        chain.insert(0, clip)

    opt = optax.chain(*chain)
    mask = _freeze_mask(params, cfg.MODEL.BACKBONE.FREEZE_AT)
    return optax.masked(opt, mask)
