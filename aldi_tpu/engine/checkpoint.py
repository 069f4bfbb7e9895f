"""Checkpoint save/restore + reference-format weight import.

Substrate equivalents: ``DetectionCheckpointer`` (+ fvcore) with the
reference's EMA-aware wrapper (``aldi/checkpoint.py:18-32``): resume =
model+optimizer+EMA+iteration; fresh start from a ``.pth`` containing both
{model, ema} initializes the student from the **EMA** weights when
``EMA.LOAD_FROM_EMA_ON_START`` (the burn-in -> DA handoff); zoo ``.pkl``
(Caffe2 names) are ingested via a name map (checkpoint_convert.py).

Native checkpoints are orbax PyTree checkpoints of the TrainState.
"""

import json
import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_step import TrainState

_CKPT_RE = re.compile(r"^model_(\d+)$")
_LAST = "last_checkpoint"


def _restore_as_numpy(ckptr, path, target):
    """Restore a pytree checkpoint as host numpy arrays.

    Checkpoints written from jax.Arrays on backends whose shardings do not
    round-trip through orbax metadata (e.g. the axon TPU tunnel) cannot be
    deserialized back to jax.Array ("Sharding of jax.Array cannot be
    None"); numpy restore side-steps that and the trainer re-places arrays
    on device at first use. Single-host semantics — a future multi-host
    FSDP restore should pass explicit shardings instead."""
    item = jax.device_get(target)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item
    )
    return ckptr.restore(path, item=item, restore_args=restore_args)


class Checkpointer:
    def __init__(self, output_dir: str, logger=None):
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self.logger = logger

    # ----------------------------------------------------------- native IO
    def save(self, state: TrainState, name: Optional[str] = None,
             extra: Optional[dict] = None):
        """``extra``: JSON-serializable trainer bookkeeping (best-AP50 map,
        etc. — the reference's BestCheckpointer hook state,
        ``aldi/trainer.py:187-196``) persisted alongside the pytree so a
        resumed run does not re-save a worse "best"."""
        step = int(state.step)
        name = name or f"model_{step:07d}"
        path = os.path.join(self.dir, name)
        # hand orbax the jax.Arrays directly: under multi-host FSDP the
        # state is not fully addressable per process, so device_get would
        # raise; orbax handles sharded multihost saves natively
        self._ckptr.save(path, state, force=True)
        if extra is not None:
            with open(os.path.join(path, "trainer_state.json"), "w") as f:
                json.dump(extra, f)
        with open(os.path.join(self.dir, _LAST), "w") as f:
            f.write(name)
        if self.logger:
            self.logger.info(f"Saved checkpoint {path}")
        return path

    def load_extra(self, path: Optional[str] = None) -> dict:
        path = path or self.latest_path()
        if not path:
            return {}
        p = os.path.join(path, "trainer_state.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.dir, _LAST))

    def latest_path(self) -> Optional[str]:
        p = os.path.join(self.dir, _LAST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return os.path.join(self.dir, f.read().strip())

    def load(self, path: str, target: TrainState) -> TrainState:
        return _restore_as_numpy(self._ckptr, path, target)

    # ------------------------------------------------- reference interop
    def resume_or_load(
        self, state: TrainState, weights: str, resume: bool,
        load_from_ema: bool = True,
    ) -> TrainState:
        """Reference semantics (``aldi/checkpoint.py`` +
        DetectionCheckpointer): if resume and a checkpoint exists in
        OUTPUT_DIR, restore everything; else fresh-load MODEL.WEIGHTS into
        the model only (EMA entry preferred when present +
        ``load_from_ema``)."""
        if resume and self.has_checkpoint():
            path = self.latest_path()
            if self.logger:
                self.logger.info(f"Resuming from {path}")
            return self.load(path, state)
        if not weights:
            return state
        return load_reference_weights(
            state, weights, load_from_ema=load_from_ema, logger=self.logger
        )


def load_reference_weights(
    state: TrainState, path: str, load_from_ema: bool = True, logger=None
) -> TrainState:
    """Fresh-start weight loading from a reference-format file.

    Supports: native orbax dirs, torch ``.pth`` (ALDI checkpoints with
    {model, ema} or plain state dicts), and D2 zoo ``.pkl``.
    """
    from .checkpoint_convert import (
        load_d2_pkl_state_dict,
        load_torch_state_dict,
        torch_state_dict_to_tree,
    )

    if os.path.isdir(path):  # native checkpoint dir: model weights only
        ckptr = ocp.PyTreeCheckpointer()
        restored = _restore_as_numpy(ckptr, path, state)
        new_params = restored.params
        new_ema = (
            restored.ema_params
            if (load_from_ema and restored.ema_params is not None)
            else None
        )
        params = new_ema if new_ema is not None else new_params
        frozen = restored.frozen
        # model_state (e.g. YOLO BatchNorm running stats) must come along —
        # dropping it would hand the DA run randomly initialized BN stats
        # while the torch .pth path maps them (burn-in -> DA handoff)
        model_state = state.model_state
        if state.model_state and restored.model_state:
            model_state = restored.model_state
        return state.replace(
            params=params,
            frozen=frozen,
            model_state=model_state,
            ema_params=(
                jax.tree_util.tree_map(np.copy, params)
                if state.ema_params is not None else None
            ),
            ema_model_state=(
                jax.tree_util.tree_map(np.copy, model_state)
                if state.ema_model_state is not None else None
            ),
        )

    if path.endswith(".pkl"):
        sd = load_d2_pkl_state_dict(path)
    else:
        sd = load_torch_state_dict(path)
        if not isinstance(sd, dict):  # a pickled nn.Module
            sd = sd.state_dict()
        if "model" in sd and not isinstance(sd["model"], dict):
            # ultralytics-style {"model": Model[, "ema": Model]} wrapper
            wrapped = {"model": sd["model"].float().state_dict()}
            if sd.get("ema") is not None and not isinstance(sd["ema"], dict):
                wrapped["ema"] = sd["ema"].float().state_dict()
            sd = wrapped
        if "model" in sd and isinstance(sd["model"], dict):
            if load_from_ema and isinstance(sd.get("ema"), dict):
                # EMA entries are prefixed "model." (reference
                # aldi/checkpoint.py:24-27)
                ema = {
                    k[len("model."):] if k.startswith("model.") else k: v
                    for k, v in sd["ema"].items()
                }
                sd = ema
                if logger:
                    logger.info(f"Initializing from EMA weights in {path}")
            else:
                sd = sd["model"]

    model_state = jax.device_get(state.model_state) if state.model_state else None
    out = torch_state_dict_to_tree(
        sd, jax.device_get(state.params), jax.device_get(state.frozen),
        model_state=model_state, logger=logger,
    )
    params, frozen = out[0], out[1]
    new_model_state = out[2] if len(out) > 2 else state.model_state
    copy = lambda t: jax.tree_util.tree_map(np.copy, t)
    return state.replace(
        params=params,
        frozen=frozen,
        model_state=new_model_state,
        ema_params=copy(params) if state.ema_params is not None else None,
        ema_model_state=(
            copy(new_model_state)
            if state.ema_model_state is not None else None
        ),
    )
