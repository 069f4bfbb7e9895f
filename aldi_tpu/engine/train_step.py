"""The DAOD iteration as ONE jitted, donated, mesh-shardable train step.

This is the functional re-design of the reference's hot loop
``run_model_labeled_unlabeled`` (``aldi/trainer.py:28-117``) plus its
surrounding machinery (EMA update in before_step ``aldi/trainer.py:242-246``,
distiller ``aldi/distill.py:144-191``, pseudo-labeler, device augs):

    state, metrics = train_step(state, batch, rng)

compiles the EMA blend, teacher pseudo-labeling inference, device-side strong
augmentation, all student forwards, distill/align losses, backward, and the
optimizer update into a single XLA program. Under a data-parallel sharding,
XLA inserts the gradient all-reduce over ICI (replacing DDP/NCCL,
SURVEY.md section 2.6).

Stream weighting reproduces the reference's gradient-accumulation math:
every loss is divided by ``num_grad_accum_steps = (n_lw + n_ls + n_uw) /
model_batch_size`` and each stream contributes ``n_s / model_batch_size``
chunks (``aldi/trainer.py:51-52,70``), so stream s has effective weight
``n_s / (n_lw + n_ls + n_uw)`` on its mean loss — including the distill
stream, whose size is NOT part of the denominator.

Teacher cost note: the reference runs the teacher twice per iteration (eval
inference for pseudo-labels + a hooked train-mode pass,
``aldi/distill.py:148-162``). The two passes see the same images and the
same weights, so backbone + RPN-head outputs are computed once here and
shared; only the teacher box head runs a second time (on the student's
sampled proposals).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.strong_aug import strong_augment
from ..solver import build_optimizer
from ..structures import Instances
from .distill import gate_hard_losses
from .ema import ema_update


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    frozen: Any  # non-trainable collections (FrozenBN stats), shared w/ EMA
    opt_state: Any
    ema_params: Any = None  # teacher weights; None when EMA disabled
    # mutable model collections (e.g. YOLO BatchNorm running stats), updated
    # by training forwards; the reference carries these as torch buffers and
    # EMA-blends them like weights (``aldi/ema.py:32-50``)
    model_state: Any = None
    ema_model_state: Any = None


def create_train_state(cfg, detector, rng) -> tuple:
    """Initialize model variables + optimizer. Returns (state, optimizer).

    The whole state construction runs under jit: un-jitted optax init and
    per-leaf tree copies dispatch one RPC per leaf on a remote-device
    backend (~150 ms each through the tunnel)."""
    variables = detector.init_variables(rng)
    params = variables["params"]
    tx = build_optimizer(cfg, params)
    use_ema = cfg.EMA.ENABLED

    @jax.jit
    def make_state(variables):
        params = variables["params"]
        frozen = variables.get("frozen", {})
        model_state = {
            k: v for k, v in variables.items() if k not in ("params", "frozen")
        }
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            frozen=frozen,
            opt_state=tx.init(params),
            ema_params=copy(params) if use_ema else None,
            model_state=model_state,
            ema_model_state=copy(model_state) if use_ema else None,
        )

    return make_state(variables), tx


def _gt_from_batch(stream: dict) -> Instances:
    return Instances(
        boxes=stream["boxes"],
        classes=stream["classes"],
        valid=stream["valid"],
        scores=None,
    )


def make_train_step(cfg, detector, tx):
    """Build the jitted step for this config's stream composition."""
    contents = cfg.DATASETS.BATCH_CONTENTS
    do_weak = "labeled_weak" in contents
    do_strong = "labeled_strong" in contents
    has_unlabeled = (
        any(s.startswith("unlabeled") for s in contents)
        and len(cfg.DATASETS.UNLABELED) > 0
    )
    a = cfg.DOMAIN_ADAPT.ALIGN
    do_align = a.IMG_DA_ENABLED or a.INS_DA_ENABLED
    d = cfg.DOMAIN_ADAPT.DISTILL
    do_hard = any([d.HARD_ROIH_CLS_ENABLED, d.HARD_ROIH_REG_ENABLED,
                   d.HARD_OBJ_ENABLED, d.HARD_RPN_REG_ENABLED])
    do_soft = any([d.ROIH_CLS_ENABLED, d.ROIH_REG_ENABLED, d.OBJ_ENABLED,
                   d.RPN_REG_ENABLED])
    do_distill = has_unlabeled and (do_hard or do_soft)
    if cfg.MODEL.LOAD_PROPOSALS and (do_align or do_distill):
        # D2's PrecomputedProposals generator replaces the RPN outright; the
        # DA streams (pseudo-labeling, alignment) need live proposals on
        # unlabeled images, which no proposal file covers. The reference
        # never combines them either — reject loudly.
        raise NotImplementedError(
            "MODEL.LOAD_PROPOSALS is supervised-only (Fast-R-CNN training); "
            "disable DOMAIN_ADAPT align/distill streams"
        )
    use_ema = cfg.EMA.ENABLED
    max_gt = cfg.TPU.MAX_GT
    threshold = cfg.DOMAIN_ADAPT.TEACHER.THRESHOLD

    lab_erase = cfg.AUG.LABELED_INCLUDE_RANDOM_ERASING
    unlab_erase = cfg.AUG.UNLABELED_INCLUDE_RANDOM_ERASING
    lab_mic = cfg.AUG.LABELED_MIC_AUG
    unlab_mic = cfg.AUG.UNLABELED_MIC_AUG
    mic_ratio, mic_block = cfg.AUG.MIC_RATIO, cfg.AUG.MIC_BLOCK_SIZE

    def train_step(state: TrainState, batch: dict, rng):
        keys = jax.random.split(rng, 10)
        metrics = {}

        # ---- EMA teacher update (before the step, reference before_step)
        ema_params = state.ema_params
        ema_model_state = state.ema_model_state
        if use_ema:
            ema_params = ema_update(
                state.ema_params, state.params, cfg.EMA.ALPHA, state.step,
                cfg.EMA.START_ITER,
            )
            if state.model_state:
                ema_model_state = ema_update(
                    state.ema_model_state, state.model_state, cfg.EMA.ALPHA,
                    state.step, cfg.EMA.START_ITER,
                )
        teacher_params = ema_params if use_ema else state.params
        teacher_state = (
            ema_model_state if use_ema else state.model_state
        ) or {}

        # ---- stream sizes -> reference-equivalent weights
        n_ls = batch["labeled"]["image"].shape[0] if (do_weak or do_strong) else 0
        n_lw = n_ls if do_weak else 0
        n_uw = batch["unlabeled"]["image"].shape[0] if (do_align or do_distill) else 0
        n_eff = max((n_lw if do_weak else 0) + (n_ls if do_strong else 0) + n_uw, 1)

        # ---- teacher pass (no grad): pseudo-labels + distill targets
        pseudo_gt = None
        teacher_ctx = None
        if do_distill:
            teacher_vars = {
                "params": teacher_params, "frozen": state.frozen,
                **teacher_state,
            }
            uw = batch["unlabeled"]
            teacher_ctx, pseudo_gt, t_metrics = detector.forward_teacher_ctx(
                teacher_vars, uw["image"], uw["sizes"], keys[0],
                threshold=threshold, max_gt=max_gt,
            )
            metrics.update(t_metrics)

        # ---- strong views, derived on device
        ls_images = None
        if do_strong:
            ls_images = strong_augment(
                keys[1], batch["labeled"]["image"], batch["labeled"]["sizes"],
                include_erasing=lab_erase, mic=lab_mic,
                mic_ratio=mic_ratio, mic_block_size=mic_block,
            )
        us_images = None
        if do_distill:
            us_images = strong_augment(
                keys[2], batch["unlabeled"]["image"],
                batch["unlabeled"]["sizes"],
                include_erasing=unlab_erase, mic=unlab_mic,
                mic_ratio=mic_ratio, mic_block_size=mic_block,
            )

        # ---- per-microbatch loss; `micro` carries every chunked input.
        # `streams` (static tuple) selects which stream forwards to build —
        # all of them for the joint backward, one at a time for the
        # stream-sequential backward below.
        def loss_fn(params, micro, model_state_in, streams):
            model_state = model_state_in or {}
            loss_dict = {}
            mkeys = micro["keys"]

            def variables():
                return {"params": params, "frozen": state.frozen,
                        **model_state}

            def add(losses, suffix, weight):
                for k, v in losses.items():
                    loss_dict[f"{k}_{suffix}"] = v * weight

            def absorb(aux):
                nonlocal model_state
                mut = (aux or {}).get("mutated_vars")
                if mut:
                    model_state = jax.lax.stop_gradient(mut)

            # precomputed proposals ride the labeled batch when
            # MODEL.LOAD_PROPOSALS (Fast-R-CNN training; the DA streams are
            # gated off below — the reference never combines them either)
            lab_pre_kw = {}
            if micro["lab"] is not None and "pboxes" in micro["lab"]:
                lab_pre_kw = {"precomputed": {
                    "boxes": micro["lab"]["pboxes"],
                    "valid": micro["lab"]["pvalid"],
                }}

            if do_weak and "weak" in streams:
                losses, aux = detector.forward_train(
                    variables(), micro["lab"]["image"], micro["lab"]["sizes"],
                    _gt_from_batch(micro["lab"]),
                    mkeys[0], do_align=do_align, domain_label=1.0,
                    **lab_pre_kw,
                )
                absorb(aux)
                add(losses, "source_weak", n_lw / n_eff)

            if do_strong and "strong" in streams:
                losses, aux = detector.forward_train(
                    variables(), micro["ls_images"], micro["lab"]["sizes"],
                    _gt_from_batch(micro["lab"]), mkeys[1],
                    do_align=do_align, domain_label=1.0,
                    **lab_pre_kw,
                )
                absorb(aux)
                add(losses, "source_strong", n_ls / n_eff)

            if do_align and "align" in streams:
                losses, a_aux = detector.forward_domain_align(
                    variables(), micro["uw"]["image"], micro["uw"]["sizes"],
                    mkeys[2], domain_label=0.0,
                )
                absorb(a_aux)
                add(losses, "target_weak", n_uw / n_eff)

            if do_distill and "distill" in streams:
                # student full train pass on pseudo-GT (strong view)
                std_losses, s_aux = detector.forward_train(
                    variables(), micro["us_images"], micro["uw"]["sizes"],
                    micro["pseudo"], mkeys[3],
                )
                absorb(s_aux)
                if getattr(detector, "gate_hard", True):
                    dist_losses = dict(gate_hard_losses(std_losses, cfg))
                else:
                    # HardDistiller semantics: standard losses on pseudo-GT
                    # pass through ungated (reference aldi/distill.py:78-81)
                    dist_losses = dict(std_losses)
                if do_soft:
                    teacher_vars = {
                        "params": teacher_params, "frozen": state.frozen,
                        **teacher_state,
                    }
                    dist_losses.update(
                        detector.distill_losses(teacher_vars, micro["ctx"],
                                                s_aux)
                    )
                add(dist_losses, "distill", n_uw / n_eff)

            total = sum(
                jnp.asarray(v, jnp.float32) for v in loss_dict.values()
            )
            return total, (loss_dict, model_state)

        active_streams = tuple(
            s for s, on in (("weak", do_weak), ("strong", do_strong),
                            ("align", do_align), ("distill", do_distill))
            if on
        )

        def grads_of(params, micro, model_state_in):
            """value_and_grad over the stream composition.

            SOLVER.BACKWARD_AT_END=False (reference ``aldi/trainer.py:75-79``)
            backwards each stream as soon as its forward completes, bounding
            peak activation memory to ONE stream instead of their sum — the
            recipe that lets ViTDet-B DAOD fit HBM at the full benchmark
            canvas. ``optimization_barrier`` ties stream k+1's params to
            stream k's accumulated grads so XLA cannot interleave the
            fwd+bwd pairs back into a joint (memory-peak) schedule. The loss
            math is identical: stream weights are already normalized, and
            grads simply sum."""
            if cfg.SOLVER.BACKWARD_AT_END or len(active_streams) <= 1:
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, micro, model_state_in, active_streams
                )
            grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            ms = model_state_in
            loss_dict = {}
            total = jnp.asarray(0.0, jnp.float32)
            p = params
            for i, s in enumerate(active_streams):
                (t_s, (ld_s, ms)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p, micro, ms, (s,))
                grads = jax.tree_util.tree_map(jnp.add, grads, g)
                total = total + t_s
                loss_dict.update(ld_s)
                if i + 1 < len(active_streams):
                    p, grads = jax.lax.optimization_barrier((p, grads))
            return (total, (loss_dict, ms)), grads

        micro_full = {
            "lab": batch["labeled"] if (do_weak or do_strong) else None,
            "ls_images": ls_images,
            "us_images": us_images,
            "uw": batch["unlabeled"] if (do_align or do_distill) else None,
            "pseudo": pseudo_gt,
            "ctx": teacher_ctx,
            "keys": jnp.stack([keys[3], keys[4], keys[5], keys[6]]),
        }

        accum = max(int(cfg.TPU.GRAD_ACCUM), 1)
        if accum == 1:
            (total, (loss_dict, new_model_state)), grads = grads_of(
                state.params, micro_full, state.model_state
            )
        else:
            # reference gradient accumulation (SOLVER.IMS_PER_GPU chunks,
            # ``aldi/trainer.py:86-97``) as a lax.scan over microbatches:
            # each stream splits into `accum` equal chunks; grads and losses
            # average over chunks (the same math as the reference's
            # divide-by-num-accum-steps).
            def chunked(x):
                if x is None or not hasattr(x, "ndim") or x.ndim == 0:
                    return x
                b = x.shape[0]
                assert b % accum == 0, (
                    f"batch dim {b} not divisible by TPU.GRAD_ACCUM={accum}"
                )
                return x.reshape((accum, b // accum) + x.shape[1:])

            micro_full.pop("keys")
            micro_chunks = jax.tree_util.tree_map(chunked, micro_full)
            micro_chunks["keys"] = jax.vmap(
                lambda i: jax.random.split(jax.random.fold_in(keys[7], i), 4)
            )(jnp.arange(accum))

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )

            def body(carry, chunk):
                grads_acc, ms = carry
                (tot, (ld, new_ms)), g = grads_of(state.params, chunk, ms)
                grads_acc = jax.tree_util.tree_map(
                    lambda a, b_: a + b_ / accum, grads_acc, g
                )
                return (grads_acc, new_ms), (tot, ld)

            (grads, new_model_state), (totals, loss_dicts) = jax.lax.scan(
                body, (zero_grads, state.model_state), micro_chunks
            )
            total = totals.mean()
            loss_dict = jax.tree_util.tree_map(
                lambda v: v.mean(), loss_dicts
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics.update(loss_dict)
        metrics["total_loss"] = total

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=ema_params,
            model_state=new_model_state,
            ema_model_state=ema_model_state,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
