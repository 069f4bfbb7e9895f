"""The DAOD trainer: loop, hooks-equivalent scheduling, eval, checkpoints.

Substrate equivalents: ``DefaultTrainer``/``SimpleTrainer``/``AMPTrainer``
plus the reference's ``ALDITrainer`` (``aldi/trainer.py:140-246``). The hook
system collapses into explicit schedule points in one loop:

- EMA update: inside the jitted step (reference before_step,
  ``aldi/trainer.py:242-246``)
- eval every TEST.EVAL_PERIOD on the teacher when EMA is on
  (``aldi/trainer.py:177-185``)
- best-checkpoint per test set on bbox/AP50 (``aldi/trainer.py:187-196``)
- periodic checkpoints every SOLVER.CHECKPOINT_PERIOD
- metric writers every 20 iters (substrate PeriodicWriter default)

AMP note: SOLVER.AMP.ENABLED selects bfloat16 compute (fp32 params); no
GradScaler exists because bf16 has fp32 exponent range (SURVEY.md section 2.6).
"""

import os
import time

import jax
import numpy as np

from .. import data  # noqa: F401  (dataset registrations)
from ..data import datasets  # noqa: F401
from ..data.loader import DevicePrefetcher, WeakStrongLoader
from ..models import build_detector
from ..parallel.mesh import make_mesh, shard_batch, shard_state
from ..utils.events import EventStorage, build_writers, setup_logger
from .checkpoint import Checkpointer
from .evaluator import inference_on_dataset
from .train_step import create_train_state, make_train_step

WRITE_PERIOD = 20


def _stream_sizes(cfg):
    ratios = cfg.DATASETS.BATCH_RATIOS
    total = cfg.SOLVER.IMS_PER_BATCH
    return [int(total * r / sum(ratios)) for r in ratios]


def auto_scale_workers(cfg, world_size: int):
    """Substrate ``DefaultTrainer.auto_scale_workers`` (consumed at reference
    ``aldi/dropin.py:46``): when SOLVER.REFERENCE_WORLD_SIZE is set, rescale
    batch size, LR, schedule, and eval/checkpoint periods to the actual world
    size. Returns a new cfg."""
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old == 0 or old == world_size:
        return cfg
    cfg = cfg.clone()
    scale = world_size / old
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(
        round(cfg.SOLVER.CHECKPOINT_PERIOD / scale)
    )
    cfg.SOLVER.REFERENCE_WORLD_SIZE = world_size
    return cfg


def maybe_init_distributed(logger=None):
    """Initialize jax.distributed on multi-host TPU pods (replaces the
    reference's process-spawning ``launch``, ``tools/train_net.py:90-98``).
    No-op on a single host."""
    import jax

    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
            if logger:
                logger.info(
                    f"jax.distributed: process {jax.process_index()} of "
                    f"{jax.process_count()}"
                )
        except Exception as e:  # already initialized / single host
            if logger:
                logger.info(f"jax.distributed.initialize skipped: {e}")


class ALDITrainer:
    def __init__(self, cfg):
        self.logger = setup_logger(cfg.OUTPUT_DIR)
        maybe_init_distributed(self.logger)
        # MESH_DATA = data-axis width, MESH_MODEL = model-axis width;
        # 0/unset data width means "all devices divided by the model width".
        # The reference's "world size" = #GPUs; ours = the data width —
        # model shards share one batch slice, so throughput (and the
        # world-size rescale of batch/LR/schedule) scales with it.
        n_model = max(1, cfg.TPU.MESH_MODEL)
        n_data = cfg.TPU.MESH_DATA or max(1, len(jax.devices()) // n_model)
        cfg = auto_scale_workers(cfg, n_data)
        if not cfg.is_frozen():
            cfg.freeze()
        self.cfg = cfg
        self.detector = build_detector(cfg)

        seed = cfg.SEED if cfg.SEED >= 0 else 42
        self.base_key = jax.random.PRNGKey(seed)
        init_key, self.train_key = jax.random.split(self.base_key)

        self.state, self._tx = create_train_state(cfg, self.detector, init_key)
        self.step_fn = make_train_step(cfg, self.detector, self._tx)

        n_mesh = n_data * n_model
        assert n_mesh <= len(jax.devices()), (
            f"mesh {n_data} data x {n_model} model = {n_mesh} devices, but "
            f"only {len(jax.devices())} are available"
        )
        self.mesh = (make_mesh(n_mesh, n_model)
                     if n_mesh > 1 else None)
        if self.mesh is not None:
            for c, s in zip(cfg.DATASETS.BATCH_CONTENTS,
                            _stream_sizes(cfg)):
                assert s % n_data == 0, (
                    f"stream {c} batch {s} not divisible by data-axis size "
                    f"{n_data}; adjust SOLVER.IMS_PER_BATCH or TPU.MESH_*"
                )
            self.state = shard_state(self.state, self.mesh,
                                     fsdp=cfg.TPU.FSDP)
            self.logger.info(
                f"Mesh over {n_mesh} devices: data={n_data}"
                + (f" x model={n_model} (Megatron MLP sharding)"
                   if n_model > 1 else "")
                + (" + FSDP weight/optimizer sharding"
                   if cfg.TPU.FSDP else ""))

        self.loader = None  # built lazily (eval-only runs have no train data)
        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR, self.logger)
        self.storage = EventStorage()
        self.writers = build_writers(
            cfg.OUTPUT_DIR, cfg.SOLVER.MAX_ITER, self.logger
        )
        self._best = {}

    # ------------------------------------------------------------ weights
    def resume_or_load(self, resume: bool = False):
        self.state = self.checkpointer.resume_or_load(
            self.state, self.cfg.MODEL.WEIGHTS, resume,
            load_from_ema=self.cfg.EMA.ENABLED
            and self.cfg.EMA.LOAD_FROM_EMA_ON_START,
        )
        if resume and self.checkpointer.has_checkpoint():
            # restore best-AP50 bookkeeping so the resumed run does not
            # re-save a worse "best" on its first eval
            self._best = dict(
                self.checkpointer.load_extra().get("best_ap50", {})
            )
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh,
                                     fsdp=self.cfg.TPU.FSDP)

    # --------------------------------------------------------------- train
    def train(self):
        cfg = self.cfg
        if self.loader is None:
            self.loader = WeakStrongLoader(
                cfg, self.detector.canvas, seed=int(cfg.SEED if cfg.SEED >= 0 else 42)
            )
        start = int(jax.device_get(self.state.step))
        # exact-resume determinism: continue the deterministic
        # (seed, batch_index) sampler stream where the saved run stopped.
        # Unconditional: the device prefetcher below pulls ahead of the
        # consumed position, so a second train() on the same trainer must
        # rewind past any prefetched-but-unconsumed batches too.
        self.loader.seek(start)
        max_iter = cfg.SOLVER.MAX_ITER
        self.logger.info(f"Starting training from iteration {start}")
        self.storage.iter = start

        # device-transfer pipeline: overlap the host->device copy of the
        # canvases with the previous step's compute (see DevicePrefetcher)
        if self.mesh is not None:
            put_fn = lambda b: shard_batch(b, self.mesh)
        else:
            put_fn = lambda b: jax.tree_util.tree_map(jax.device_put, b)
        depth = cfg.TPU.DEVICE_PREFETCH
        batches = (
            DevicePrefetcher(self.loader, put_fn, depth) if depth > 0
            else iter(self.loader)
        )
        no_prefetch = depth <= 0

        data_t0 = time.time()
        # throughput over the whole write window, not a single synced step:
        # a per-step time around the blocking device_get double-counts the
        # async dispatch pipeline and understates steady-state img/s
        win_t0, win_iters = time.time(), 0
        evaluated_now, last_results = False, {}
        for it in range(start, max_iter):
            batch = next(batches)
            data_time = time.time() - data_t0
            if no_prefetch and self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            if cfg.TPU.PROFILE_DIR:  # trace a 3-iter window post-warmup
                if it == start + 10:
                    jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                elif it == start + 13:
                    jax.profiler.stop_trace()
                    self.logger.info(
                        f"profiler trace written to {cfg.TPU.PROFILE_DIR}"
                    )

            t_disp = time.time()
            step_key = jax.random.fold_in(self.train_key, it)
            self.state, metrics = self.step_fn(self.state, batch, step_key)
            # time spent in the (nominally async) dispatch: on a remote
            # backend this surfaces tunnel flow-control backpressure and
            # per-op RPC latency that data_time alone cannot explain
            dispatch_time = time.time() - t_disp
            win_iters += 1

            if cfg.VIS_PERIOD and (it + 1) % cfg.VIS_PERIOD == 0:
                self._visualize(batch, it + 1)

            self.storage.iter = it + 1
            if (it + 1) % WRITE_PERIOD == 0 or it == start:
                host_metrics = {
                    k: float(v) for k, v in jax.device_get(metrics).items()
                }
                elapsed = time.time() - win_t0
                host_metrics["images_per_sec"] = (
                    cfg.SOLVER.IMS_PER_BATCH * win_iters / max(elapsed, 1e-9)
                )
                host_metrics["data_time"] = data_time
                host_metrics["dispatch_time"] = dispatch_time
                self.storage.put_scalars(**host_metrics)
                for w in self.writers:
                    w.write(self.storage)
                total = host_metrics.get("total_loss", 0.0)
                if not np.isfinite(total):
                    raise FloatingPointError(
                        f"Loss became {total} at iteration {it}"
                    )
                win_t0, win_iters = time.time(), 0

            next_it = it + 1
            evaluated_now = (
                cfg.TEST.EVAL_PERIOD and next_it % cfg.TEST.EVAL_PERIOD == 0
            )
            if evaluated_now:
                last_results = self._eval_and_track_best()
                win_t0, win_iters = time.time(), 0  # exclude eval time
            if (cfg.SOLVER.CHECKPOINT_PERIOD
                    and next_it % cfg.SOLVER.CHECKPOINT_PERIOD == 0
                    ) or next_it == max_iter:
                self.checkpointer.save(
                    self.state, extra={"best_ap50": self._best}
                )
                win_t0, win_iters = time.time(), 0  # exclude ckpt time
            data_t0 = time.time()

        if not no_prefetch:
            # stop the transfer thread before the trailing eval so it does
            # not keep staging batches; on abnormal exit the daemon thread
            # parks after `depth` queued batches and dies with the process
            batches.close()
        if cfg.TEST.EVAL_PERIOD:
            # don't re-run the full inference pass when the loop's last
            # iteration already evaluated (MAX_ITER % EVAL_PERIOD == 0)
            if evaluated_now:
                return last_results
            return self._eval_and_track_best()
        return {}

    def _visualize(self, batch, it):
        """VIS_PERIOD training-batch visualization (substrate writes these
        to TensorBoard; here PNGs with GT boxes under OUTPUT_DIR/vis)."""
        try:
            from PIL import Image, ImageDraw

            out_dir = os.path.join(self.cfg.OUTPUT_DIR, "vis")
            os.makedirs(out_dir, exist_ok=True)
            lab = jax.device_get(batch["labeled"])
            bgr = self.cfg.INPUT.FORMAT.upper() == "BGR"
            for i in range(min(2, lab["image"].shape[0])):
                arr = np.asarray(lab["image"][i], np.uint8)
                if bgr:
                    arr = arr[:, :, ::-1]
                img = Image.fromarray(arr)
                d = ImageDraw.Draw(img)
                for b, v in zip(lab["boxes"][i], lab["valid"][i]):
                    if v:
                        d.rectangle([float(x) for x in b],
                                    outline=(255, 60, 60), width=2)
                img.save(os.path.join(out_dir, f"iter{it:06d}_{i}.png"))
        except Exception as e:  # visualization must never kill training
            self.logger.warning(f"visualization failed: {e}")

    # ---------------------------------------------------------------- eval
    def _eval_variables(self):
        """Evaluate the teacher when EMA is on (reference
        ``aldi/trainer.py:177-180``)."""
        use_ema = self.cfg.EMA.ENABLED and self.state.ema_params is not None
        params = self.state.ema_params if use_ema else self.state.params
        extra = (
            self.state.ema_model_state if use_ema else self.state.model_state
        ) or {}
        return {"params": params, "frozen": self.state.frozen, **extra}

    def test(self, variables=None):
        variables = variables or self._eval_variables()
        results = {}
        for ds in self.cfg.DATASETS.TEST:
            results[ds] = inference_on_dataset(
                self.detector, variables, ds, self.cfg, logger=self.logger
            )
        return results

    def _eval_and_track_best(self):
        results = self.test()
        for ds, res in results.items():
            self.storage.put_scalars(
                **{f"{ds}/{k}": v for k, v in res.items() if "bbox" in k}
            )
            ap50 = res.get("bbox/AP50", float("nan"))
            if np.isfinite(ap50) and ap50 > self._best.get(ds, -1.0):
                self._best[ds] = ap50
                self.checkpointer.save(
                    self.state, name=f"{ds}_model_best",
                    extra={"best_ap50": self._best},
                )
                self.logger.info(f"New best {ds} AP50 = {ap50:.2f}")
        return results
