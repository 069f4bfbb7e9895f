"""Host data pipeline: determinism and batch-contract checks."""

import os

import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from tests.synthetic_data import register_synthetic


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    register_synthetic(
        str(tmp_path_factory.mktemp("loaderdata")), prefix="loadsynth"
    )
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64, 96)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.DATASETS.TRAIN = ("loadsynth_train",)
    cfg.DATASETS.UNLABELED = ("loadsynth_unlabeled",)
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.SOLVER.IMS_PER_BATCH = 4
    return cfg


def test_loader_batches_deterministic_across_thread_counts(cfg):
    """Batch k is a pure function of (seed, k): 1 thread and 4 threads must
    produce byte-identical streams (the reference's worker processes are
    order-dependent; ours are not)."""
    from aldi_tpu.data.loader import WeakStrongLoader

    def take(n_threads, n_batches=4):
        loader = WeakStrongLoader(cfg, (128, 128), seed=7,
                                  num_threads=n_threads)
        return [next(loader) for _ in range(n_batches)]

    a = take(1)
    b = take(4)
    for ba, bb in zip(a, b):
        for stream in ("labeled", "unlabeled"):
            for k in ba[stream]:
                np.testing.assert_array_equal(
                    ba[stream][k], bb[stream][k], err_msg=f"{stream}/{k}"
                )


def test_loader_seed_changes_stream(cfg):
    from aldi_tpu.data.loader import WeakStrongLoader

    a = next(WeakStrongLoader(cfg, (128, 128), seed=1, num_threads=2))
    b = next(WeakStrongLoader(cfg, (128, 128), seed=2, num_threads=2))
    assert not np.array_equal(a["labeled"]["image"], b["labeled"]["image"])


def test_loader_batch_contract(cfg):
    from aldi_tpu.data.loader import WeakStrongLoader

    batch = next(WeakStrongLoader(cfg, (128, 128), seed=0, num_threads=2))
    lab, unlab = batch["labeled"], batch["unlabeled"]
    assert lab["image"].shape == (2, 128, 128, 3)
    assert lab["image"].dtype == np.uint8
    assert lab["boxes"].shape == (2, 8, 4)
    assert lab["valid"].dtype == bool
    assert unlab["image"].shape == (2, 128, 128, 3)
    assert "boxes" not in unlab  # unlabeled stream strips annotations
    # sizes lie inside the canvas
    assert (lab["sizes"] <= 128).all() and (lab["sizes"] > 0).all()
    # every valid gt box lies inside its image's valid region
    for i in range(2):
        for b, v in zip(lab["boxes"][i], lab["valid"][i]):
            if v:
                h, w = lab["sizes"][i]
                assert 0 <= b[0] < b[2] <= w + 1e-3
                assert 0 <= b[1] < b[3] <= h + 1e-3


def test_loader_seek_resumes_exact_stream(cfg):
    """seek(k) must continue the deterministic sampler stream exactly where
    a fresh run would be at iteration k (exact-resume determinism; the
    reference has no equivalent — its worker processes restart the
    sampler)."""
    from aldi_tpu.data.loader import WeakStrongLoader

    fresh = WeakStrongLoader(cfg, (128, 128), seed=3, num_threads=2)
    want = [next(fresh) for _ in range(6)][3:]

    resumed = WeakStrongLoader(cfg, (128, 128), seed=3, num_threads=2)
    next(resumed)  # consume a batch, then seek past it
    resumed.seek(3)
    got = [next(resumed) for _ in range(3)]

    for ba, bb in zip(want, got):
        for stream in ("labeled", "unlabeled"):
            for k in ba[stream]:
                np.testing.assert_array_equal(
                    ba[stream][k], bb[stream][k], err_msg=f"{stream}/{k}"
                )


def test_device_prefetcher_orders_and_propagates():
    """DevicePrefetcher must deliver put_fn(batch) in loader order, surface
    worker exceptions in the consumer, and join its thread on close()."""
    import itertools

    from aldi_tpu.data.loader import DevicePrefetcher

    src = iter(range(100))
    pf = DevicePrefetcher(src, lambda x: x * 10, depth=3)
    got = [next(pf) for _ in range(20)]
    assert got == [i * 10 for i in range(20)]
    pf.close()
    assert not pf._thread.is_alive()

    class Boom(RuntimeError):
        pass

    def bad_put(x):
        if x == 2:
            raise Boom("transfer failed")
        return x

    pf = DevicePrefetcher(iter(itertools.count()), bad_put, depth=2)
    assert next(pf) == 0
    assert next(pf) == 1
    try:
        next(pf)
    except Boom:
        pass
    else:
        raise AssertionError("worker exception was not propagated")
    pf.close()


def test_device_prefetcher_close_unblocks_full_queue():
    """close() must not deadlock when the worker is parked on a full queue."""
    import time

    from aldi_tpu.data.loader import DevicePrefetcher

    pf = DevicePrefetcher(iter(range(1000)), lambda x: x, depth=1)
    time.sleep(0.2)  # let the worker fill the queue and block
    pf.close()
    assert not pf._thread.is_alive()
